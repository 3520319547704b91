package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 shuffle/skew row).
  *
  * First line of defense is AQE's skew-join splitting (on by default in
  * GraftSession). Salting is the manual fallback for the cases AQE can't
  * fix — e.g. a skewed *aggregation* key, or a skewed join where the
  * hot key's rows exceed one executor's memory even after splitting.
  */
object Skew {

  /** Salted equi-join: left rows get a random-but-deterministic salt in
    * [0, buckets); the (smaller) right side is exploded ×buckets so
    * every (key, salt) partition finds its match. Result equals
    * `left.join(right, key)` exactly (checked in SkewSpec) but the hot
    * key's rows spread over `buckets` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    // deterministic salt (hash of the whole left row), not rand(): keeps
    // the engine's reproducibility contract
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
    val exploded = right.withColumn("_salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For algebraic aggregates this is
    * exactly groupBy(key).agg(sum) but the first shuffle spreads a hot
    * key over `buckets` partitions.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                buckets: Int): DataFrame =
    // salt from the WHOLE row, not the value column: the canonical skew
    // case is a hot key with heavily duplicated values, where
    // hash(value) would put every row in one salt bucket (ADVICE r1)
    df.withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"))
}
