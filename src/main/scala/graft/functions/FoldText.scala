package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text fold for dedup/join keys: Unicode-normalize, strip
  * accents, lowercase, collapse whitespace runs, trim.
  *
  * Exact algorithm (chosen so the result is ORACLE-checkable against
  * DuckDB's `trim(regexp_replace(lower(strip_accents(nfc_normalize(x))),
  * '\s+', ' ', 'g'))`):
  *   1. NFD-decompose, drop combining marks (Mn/Me/Mc) — equivalent to
  *      `strip_accents` for precomposed AND combining-mark inputs;
  *   2. NFC-recompose what remains (identity for Latin, keeps other
  *      scripts canonical);
  *   3. lowercase with root-locale rules;
  *   4. collapse every whitespace run to one ASCII space and trim.
  *
  * Shared by the interpreted and generated paths so they cannot diverge
  * (the [[JaroWinklerAlgo]] pattern).
  */
object FoldTextAlgo {
  def fold(u: UTF8String): UTF8String = {
    val nfd = Normalizer.normalize(u.toString, Normalizer.Form.NFD)
    val noMarks = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK &&
          t != Character.COMBINING_SPACING_MARK) noMarks.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val lowered = Normalizer.normalize(noMarks.toString, Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(lowered.length)
    var pendingSpace = false
    var started = false
    i = 0
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      if (Character.isWhitespace(cp)) pendingSpace = true
      else {
        if (pendingSpace && started) out.append(' ')
        out.appendCodePoint(cp)
        pendingSpace = false
        started = true
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}

/** Codegen'd fold over a string column: one static call per row, no
  * interpreted fallback — stays inside whole-stage codegen on the
  * dedup-key hot path.
  */
case class FoldText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fold_text"

  override def nullSafeEval(a: Any): Any =
    FoldTextAlgo.fold(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.FoldTextAlgo.fold($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
