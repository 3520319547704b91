package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cosine_sim(x, x)` in one pass: d = Σxᵢ², result = d/(√d·√d).
  *
  * This is the target of the SimplifySelfCosine rewrite. It is
  * bit-identical to `CosineSimilarity(x, x)` — same accumulation order,
  * same final division — so the rewrite is exactly semantics-preserving,
  * including the degenerate cases a literal 1.0 would break:
  * zero-norm / empty arrays give 0/0 = NaN, non-finite elements
  * propagate NaN, and even the benign `1.0 ± ulp` of d/(√d)² on normal
  * vectors is reproduced. The win is 1 multiply per element instead
  * of 3 and one array read instead of two.
  */
case class SelfCosine(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "self_cosine"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var d = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      d += xi * xi
      i += 1
    }
    d / (math.sqrt(d) * math.sqrt(d))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
        |int $n = $a.numElements();
        |double $d = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double xi = (double) $a.getFloat($i);
        |  $d += xi * xi;
        |}
        |${ev.value} = $d / (java.lang.Math.sqrt($d) * java.lang.Math.sqrt($d));
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
