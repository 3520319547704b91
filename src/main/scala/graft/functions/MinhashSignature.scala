package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a token array: element i is the minimum over
  * tokens of `xxh64_int(i, xxh64(token, 42))` — the same family Spark's
  * `xxhash64(token, i)` produces (int-typed i hashed into the chain),
  * 64 independent hash functions from one string hash per token.
  *
  * Replaces explode → groupBy(doc) with 64 min-aggregates: a narrow
  * per-row projection, no shuffle, one codegen'd loop.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val seed = 42L

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < arr.numElements()) {
      val base = XXH64.hashUTF8String(arr.getUTF8String(t), seed)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, base)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
        |long[] $sig = new long[$numHashes];
        |java.util.Arrays.fill($sig, Long.MAX_VALUE);
        |for (int $t = 0; $t < $a.numElements(); $t++) {
        |  long $base = org.apache.spark.sql.catalyst.expressions.XXH64
        |    .hashUTF8String($a.getUTF8String($t), ${seed}L);
        |  for (int $i = 0; $i < $numHashes; $i++) {
        |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
        |      .hashInt($i, $base);
        |    if ($h < $sig[$i]) $sig[$i] = $h;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
