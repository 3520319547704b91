package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature of a float-vector column: bit p is
  * set iff `v · plane_p > 0`, where component j of plane p is the
  * hash-derived pseudo-random value
  * `(pmod(xxhash64(p, j), 2000001) - 1000000) / 1e6 ∈ [-1, 1]` — the
  * exact arithmetic of the `zip_with`/`aggregate` composition this
  * replaces (VERDICT r2 item 7), accumulated in the same element order,
  * so bucket assignments are bit-identical.
  *
  * One fused pass over the vector computes all plane dots — versus the
  * previous form's 8 per-plane `sequence` + `zip_with` index arrays per
  * row — and stays inside whole-stage codegen.
  */
case class LshSignature(child: Expression, numPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"

  private val seed = 42L
  private val mod = 2000001L

  // per-plane base hashes depend only on (numPlanes, seed): computed
  // once, not per row — and embedded as literals in the generated code
  @transient private lazy val bases: Array[Long] =
    Array.tabulate(numPlanes)(p => XXH64.hashInt(p, seed))

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dots = new Array[Double](numPlanes)
    var j = 0
    while (j < v.numElements()) {
      val xj = v.getFloat(j).toDouble
      var p = 0
      while (p < numPlanes) {
        val m = ((XXH64.hashInt(j, bases(p)) % mod) + mod) % mod
        dots(p) += xj * ((m - 1000000L).toDouble / 1000000.0)
        p += 1
      }
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      if (dots(p) > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val dots = ctx.freshName("dots")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val xj = ctx.freshName("xj")
      val m = ctx.freshName("m")
      val sig = ctx.freshName("sig")
      // plane bases are compile-time constants: one shared field per
      // generated class, initialized once (not per row)
      val basesInit = bases.map(b => s"${b}L").mkString("{", ", ", "}")
      val basesRef = ctx.addMutableState("long[]", "lshBases",
        v => s"$v = new long[] $basesInit;", forceInline = false,
        useFreshName = true)
      s"""
        |double[] $dots = new double[$numPlanes];
        |for (int $j = 0; $j < $a.numElements(); $j++) {
        |  double $xj = (double) $a.getFloat($j);
        |  for (int $p = 0; $p < $numPlanes; $p++) {
        |    long $m = ((org.apache.spark.sql.catalyst.expressions.XXH64
        |      .hashInt($j, $basesRef[$p]) % ${mod}L) + ${mod}L) % ${mod}L;
        |    $dots[$p] += $xj * (((double) ($m - 1000000L)) / 1000000.0);
        |  }
        |}
        |long $sig = 0L;
        |for (int $p = 0; $p < $numPlanes; $p++) {
        |  if ($dots[$p] > 0) $sig |= (1L << $p);
        |}
        |${ev.value} = $sig;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
