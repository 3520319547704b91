package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name    stable query id (key in `SparkEntry.queries`)
  * @param oracle  equivalent DuckDB SQL over the same tables, when the
  *                operator is SQL-expressible; `None` → driver records a
  *                weaker rows-only check. Column names/types MUST match
  *                the Spark result (the driver sorts columns by name and
  *                hashes values).
  * @param run     the Spark implementation, given (session, sfDir)
  *
  * Determinism contract: every query ends in a total ORDER BY (unique key
  * set), and every double produced by arithmetic/aggregation is rounded,
  * so the result is bit-stable across engines and partitionings.
  */
final case class QuerySpec(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
