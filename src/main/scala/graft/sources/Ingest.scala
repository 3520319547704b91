package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Source/sink facade (SURVEY.md §2.1) beyond the native Parquet path.
  *
  * The reference's services ingest delimited/JSON surveillance feeds into
  * a MySQL 5.6 tier (`mysql-persistent-template.json:68`); here the same
  * surface is Spark readers with *declared* schemas and FAILFAST parsing
  * (ANSI-strict — a malformed feed fails the job instead of silently
  * nulling), plus JDBC interop for the legacy wire protocol.
  */
object Ingest {

  // --- batch sources ---

  /** Strict CSV: declared schema, header, fail on malformed rows. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Strict JSON-lines with declared schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** JDBC read against the legacy relational tier (MySQL wire :3306).
    * `partitionColumn`/bounds split the scan into `numPartitions`
    * parallel range queries — the knob that makes a JDBC scan scale.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: Option[(String, Long, Long, Int)] = None,
               props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withPart = partitionColumn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
    props.foldLeft(withPart) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  // --- batch sinks ---

  /** Parquet sink, optionally hive-partitioned by columns (the layout
    * that enables partition pruning downstream, SURVEY.md §4).
    */
  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append,
                props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc").mode(mode)
      .option("url", url).option("dbtable", table)
    props.foldLeft(w) { case (r, (k, v)) => r.option(k, v) }.save()
  }

  // --- streaming sources / sinks ---

  /** File-based streaming source (new files under `path` become
    * micro-batches) with declared schema. `path` may be a glob; when it
    * does not itself name a directory (e.g. a single-file fixture),
    * pass the enclosing directory as `basePath` — the source requires a
    * directory there for partition discovery.
    */
  def readStreamFiles(spark: SparkSession, path: String, schema: StructType,
                      format: String = "parquet",
                      basePath: Option[String] = None): DataFrame = {
    val r = spark.readStream.schema(schema).format(format)
    basePath.fold(r)(b => r.option("basePath", b)).load(path)
  }

  /** Exactly-once parquet streaming sink: checkpointed append. */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())

  /** Idempotent micro-batch sink: hands (batchDF, batchId) to `write`;
    * the batchId is what a JDBC/key-value upsert uses to dedupe replayed
    * batches after failure (exactly-once at the sink contract).
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String)
                      (write: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(write)

  /** Keyed MERGE/upsert for a [[foreachBatchSink]] body, with the
    * exactly-once REPLAY contract made explicit: each batch merges into
    * a parquet table (batch rows replace same-key rows, others carry
    * over) and records its batchId in `_commits` AFTER the table swap;
    * a replayed batchId — what foreachBatch redelivers after a crash
    * between sink write and checkpoint commit — returns before touching
    * anything, so the table stays byte-identical. Idempotence therefore
    * rests on the batchId key alone, which is exactly Spark's contract
    * (same batchId ⇒ same data on redelivery).
    *
    * Crash windows, stated: a crash after swap but before the commit
    * record re-runs the merge on replay — and keyed upsert of identical
    * rows is itself idempotent, so the table CONTENT converges either
    * way; the `_commits` record only spares the rewrite. The swap is
    * rename-based: readers of `data/` see old or new, never a partial.
    *
    * Single-writer by construction (micro-batches are serialized per
    * query). The whole-table rewrite (`coalesce(1)`) is the
    * fixture-scale stand-in for a real table format's partition-scoped
    * copy-on-write or merge-on-read — the batchId ledger and swap
    * discipline are the part that transfers unchanged.
    *
    * `batch` must be unique per `keys` (pre-reduce it in the caller —
    * e.g. max_by on an ordering column); asserted cheaply against the
    * merged result.
    */
  def upsertParquet(tableDir: String, keys: Seq[String])
                   (batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = batch.sparkSession
    val root = new java.io.File(tableDir)
    root.mkdirs()
    val commits = new java.io.File(root, "_commits")
    val done: Set[Long] =
      if (!commits.exists()) Set.empty
      else {
        val src = scala.io.Source.fromFile(commits)
        try src.getLines().filter(_.nonEmpty).map(_.toLong).toSet
        finally src.close()
      }
    if (done.contains(batchId)) return // replay of a committed batch: no-op
    val data = new java.io.File(root, "data")
    val merged =
      if (!data.exists()) batch
      else spark.read.parquet(data.getPath)
        .join(batch.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(batch)
    val tmp = new java.io.File(root, s"tmp_$batchId")
    // write fully (reads the old files) BEFORE the old dir is dropped
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val nKeys = spark.read.parquet(tmp.getPath)
      .select(keys.map(col): _*).distinct().count()
    val nRows = spark.read.parquet(tmp.getPath).count()
    require(nKeys == nRows,
      s"upsertParquet: batch $batchId not unique per ${keys.mkString(",")}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(data)
    require(tmp.renameTo(data), s"upsertParquet: swap failed for $batchId")
    val out = new java.io.FileWriter(commits, true)
    try out.write(s"$batchId\n") finally out.close()
  }
}
