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

  /** Salt for two-phase aggregation: row POSITION, not row content.
    * The canonical skew case is a hot key whose rows are heavily
    * duplicated — identical rows hash identically no matter which
    * columns feed the hash (the r1 value-hash AND a whole-row hash both
    * fail it), so only a position-derived salt guarantees spread. The
    * salt never reaches the result (it is aggregated away), so its
    * partitioning-dependence costs nothing: the engine's determinism
    * contract is about results, and the reassembled sum is exact.
    */
  def aggSalt(buckets: Int): org.apache.spark.sql.Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For algebraic aggregates this is
    * exactly groupBy(key).agg(sum) but the first shuffle spreads a hot
    * key over `buckets` partitions.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                buckets: Int): DataFrame =
    df.withColumn("_salt", aggSalt(buckets))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"))
}
