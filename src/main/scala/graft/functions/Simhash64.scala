package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array, computed entirely per-row: each
  * token's xxhash64 votes ±1 on every bit; bit b of the signature is
  * set iff the vote sum is positive.
  *
  * Replaces the explode → 64 bit-sum aggregates → reassemble pipeline:
  * same signature family, but zero shuffle (narrow projection) and one
  * codegen'd loop instead of 64 aggregate expressions.
  */
case class Simhash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val seed = 42L // matches Spark's xxhash64 default seed

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
        |int[] $votes = new int[64];
        |for (int $i = 0; $i < $a.numElements(); $i++) {
        |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
        |    .hashUTF8String($a.getUTF8String($i), ${seed}L);
        |  for (int $b = 0; $b < 64; $b++) {
        |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
        |  }
        |}
        |long $sig = 0L;
        |for (int $b = 0; $b < 64; $b++) {
        |  if ($votes[$b] > 0) $sig |= (1L << $b);
        |}
        |${ev.value} = $sig;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
