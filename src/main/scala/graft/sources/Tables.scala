package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema registry + reader facade for the fixture star schema.
  *
  * The reference data tier is a DDL-declared relational store
  * (`mysql-persistent-template.json:68` — MySQL 5.6); the engine mirrors
  * that with explicit `StructType`s per table — never schema inference in
  * production paths. Explicit schemas also let the Parquet scan prune
  * columns and push filters (verify with `.explain`: `ReadSchema`,
  * `PushedFilters`).
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** `ts` is declared LONG and read as the raw INT64 epoch ticks,
    * whatever timestamp unit the fixture was generated with — the
    * driver has shipped events.parquet as TIMESTAMP(NANOS) (rounds
    * 1–8; surfaced as long via the nanosAsLong legacy conf GraftSession
    * still sets) and as TIMESTAMP(MICROS) (round 9). [[withEventTs]]
    * normalizes by magnitude, so a fixture regeneration in either unit
    * cannot silently shift every event to 1970 again.
    */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "supplier" -> supplier,
    "customer" -> customer, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "documents" -> documents,
    "embeddings" -> embeddings, "events" -> eventsRaw)

  /** Read a fixture table with its declared schema. Resolves through the
    * session catalog when [[analyzeAll]] has registered a stats-backed
    * table for this dir (CBO row counts + column NDVs feed join
    * reordering); falls back to a plain path read otherwise.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val tbl = s"${statsDb(sfDir)}.$name"
    val df =
      if (analyzedDbs.contains(statsDb(sfDir)) && spark.catalog.tableExists(tbl))
        spark.table(tbl)
      else spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events") withEventTsAt(spark, sfDir)(df) else df
  }

  /** Dirs analyzed in this JVM — guards the per-load catalog lookup so
    * sessions that never call analyzeAll pay zero metastore round-trips.
    */
  private val analyzedDbs = scala.collection.mutable.Set.empty[String]

  private def statsDb(sfDir: String): String =
    "graft_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** Join-key + filter/group columns per table (what CBO consumes). */
  private val statCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "part" -> Seq("p_partkey", "p_brand", "p_type", "p_size"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
      "o_orderpriority", "o_totalprice"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate",
      "l_returnflag", "l_linestatus"),
    "events" -> Seq("event_id", "user_id", "event_type", "ts"),
    "documents" -> Seq("doc_id", "lang", "source"),
    "embeddings" -> Seq("vec_id", "label"))

  /** Register every fixture table as an EXTERNAL catalog table over its
    * parquet location and compute CBO statistics (row counts + column
    * stats for scalar columns). This is the production shape — tables
    * live in a catalog with ANALYZE'd stats, and the optimizer reorders
    * joins from them (SURVEY §4) — reproduced locally on the in-memory
    * catalog. No data is copied or written.
    */
  def analyzeAll(spark: SparkSession, sfDir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val db = statsDb(sfDir)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // per-table ANALYZE jobs are independent — submit them concurrently
    // (Spark schedules concurrent jobs from one session fine); the
    // wall-clock is then the largest table, not the sum of ten
    val work = schemas.toSeq.map { case (name, schema) =>
      Future {
        val tbl = s"$db.$name"
        if (!spark.catalog.tableExists(tbl)) {
          spark.sql(s"CREATE TABLE $tbl (${schema.toDDL}) USING parquet " +
            s"LOCATION '$sfDir/$name.parquet'")
        }
        spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
        // column stats only where the optimizer can use them — join keys
        // and filter/group columns. NDV over value/payload columns (the
        // doubles, free text, JSON) costs a second full scan per table
        // and never informs a plan.
        statCols.get(name).filter(_.nonEmpty).foreach { cols =>
          spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS " +
            cols.mkString(", "))
        }
      }
    }
    Await.result(Future.sequence(work), Duration.Inf)
    analyzedDbs += db
  }

  /** Nanos-long → microsecond TimestampType (truncating, matching what
    * DuckDB's TIMESTAMP_NS → TIMESTAMP cast does for positive epochs).
    * `DIV` (integer division) — `/` would go through double and lose
    * precision at 1e18-scale nanosecond epochs.
    */
  /** Raw epoch-tick long → microsecond timestamp, unit-detected by
    * magnitude: ≥ 1e17 ticks can only be nanoseconds (it would be the
    * year 5138+ in µs), below that microseconds. The fixture's 2024
    * events sit at ~1.7e18 ns / ~1.7e15 µs — three orders from the
    * boundary on either side. Fallback for frames with no backing file
    * (derived tables); file-backed reads use [[withEventTsAt]], which
    * resolves the unit ONCE from the Parquet footer.
    */
  def withEventTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(eventTicksToMicros("auto")))

  /** Epoch-tick unit of `$sfDir/events.parquet`, resolved once per dir
    * from the file footers rather than per-row magnitude (ADVICE r9 —
    * magnitude heuristics silently misclassify pre-1973 nanosecond
    * epochs). The column's logical-type annotation names the unit
    * authoritatively when present (the driver has shipped the fixture
    * as TIMESTAMP(NANOS) in rounds 1–8 and TIMESTAMP(MICROS) in round
    * 9+; Spark surfaces both as raw INT64 under the declared LongType
    * schema + the legacy nanosAsLong conf). A plain unannotated INT64
    * falls back to the footer's min/max statistics with a LOUD failure
    * if they straddle the ns/µs boundary (mixed units in one file can
    * only be a corrupt fixture), and to per-row magnitude ("auto") only
    * when the footer carries no statistics at all. All data files are
    * footer-checked (cheap — no data pages are read) and must agree.
    */
  private def eventTsUnit(spark: SparkSession, sfDir: String): String =
    tsUnitMemo.getOrElseUpdate(sfDir, {
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val root = new java.io.File(s"$sfDir/events.parquet")
      val files =
        if (root.isFile) Seq(root)
        else Option(root.listFiles()).toSeq.flatten
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .sortBy(_.getName)
      require(files.nonEmpty, s"withEventTsAt: no parquet files under $root")
      val conf = spark.sessionState.newHadoopConf()
      val units = files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val footer = r.getFooter
          footer.getFileMetaData.getSchema.getType(Seq("ts"): _*)
            .asPrimitiveType().getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit.toString.toLowerCase // millis | micros | nanos
            case _ =>
              val stats = footer.getBlocks.asScala
                .flatMap(_.getColumns.asScala)
                .filter(_.getPath.toDotString == "ts")
                .map(_.getStatistics)
                .filter(s => s != null && s.hasNonNullValue)
              if (stats.isEmpty) "auto"
              else {
                val mins = stats.map(_.genericGetMin
                  .asInstanceOf[java.lang.Long].longValue)
                val maxs = stats.map(_.genericGetMax
                  .asInstanceOf[java.lang.Long].longValue)
                val nanos = (mins ++ maxs).map(_ >= NanosBoundary).distinct
                require(nanos.size == 1,
                  s"events ts in ${f.getName} straddles the ns/µs boundary " +
                    s"(min=${mins.min}, max=${maxs.max}) — mixed-unit fixture")
                if (nanos.head) "nanos" else "micros"
              }
          }
        } finally r.close()
      }.distinct
      require(units.size == 1,
        s"events.parquet files under $sfDir disagree on the ts unit: " +
          units.sorted.mkString(","))
      units.head
    })

  private val NanosBoundary = 100000000000000000L // 1e17: year 5138+ in µs

  private val tsUnitMemo =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def eventTicksToMicros(unit: String) = unit match {
    case "nanos"  => expr("ts DIV 1000") // integer div — `/` loses precision at 1e18
    case "micros" => col("ts")
    case "millis" => col("ts") * lit(1000L)
    case "auto"   =>
      expr(s"CASE WHEN ts >= $NanosBoundary THEN ts DIV 1000 ELSE ts END")
    case u => throw new IllegalArgumentException(s"events ts unit: $u")
  }

  /** [[withEventTs]] with the unit pinned from `sfDir`'s footers — a
    * single codegen'd arithmetic op per row instead of a branch, and
    * immune to the magnitude heuristic's pre-1973 blind spot.
    */
  def withEventTsAt(spark: SparkSession, sfDir: String)(df: DataFrame): DataFrame =
    df.withColumn("ts",
      timestamp_micros(eventTicksToMicros(eventTsUnit(spark, sfDir))))

  /** Events with `ts` as timestamp — the shape all queries see. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")

  /** Register every fixture table as a temp view for spark.sql entry. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    schemas.keys.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }

  /** Register an [[Ingest.upsertParquet]] table in the catalog so the
    * SQL entry can read the table format: `name` becomes a temp view
    * over the table's CURRENT snapshot — or, with `asOfBatch`, over
    * the committed time-travel snapshot — resolved AT REGISTRATION
    * time. Snapshot-at-registration is the right isolation for a
    * view: the file list is pinned when the view is created, so a
    * concurrent writer committing new versions never shifts results
    * mid-query; re-register to see newer state (the same contract a
    * manifest-based table format gives its readers).
    */
  def registerUpsertTable(spark: SparkSession, name: String, tableDir: String,
                          asOfBatch: Option[Long] = None): Unit =
    Ingest.readUpsertTable(spark, tableDir, asOfBatch)
      .createOrReplaceTempView(name)

  /** Register a view over a NAMED TAG's snapshot
    * ([[Ingest.readUpsertTableAtTag]]) — the `table AT TAG` surface:
    * the tag's retention pin guarantees the snapshot outlives
    * keepVersions, so the view stays servable for as long as the tag
    * exists (same snapshot-at-registration isolation as above).
    */
  def registerUpsertTableAtTag(spark: SparkSession, name: String,
                               tableDir: String, tag: String): Unit =
    Ingest.readUpsertTableAtTag(spark, tableDir, tag)
      .createOrReplaceTempView(name)

  /** Expose an upsert table's change feed to SQL: registers
    * `readTableChanges(from, to)` as a view (full change rows +
    * `_change_type` / `_batch_id`), so audit/replica queries run as
    * plain `spark.sql` over the feed — the `table_changes(...)`-style
    * surface other formats expose, resolved at registration time.
    */
  def registerTableChanges(spark: SparkSession, name: String,
                           tableDir: String, fromBatch: Long,
                           toBatch: Long): Unit =
    Ingest.readTableChanges(spark, tableDir, fromBatch, toBatch)
      .createOrReplaceTempView(name)

  /** Expose the FULL dead-letter rows to SQL
    * ([[Ingest.readQuarantine]] — table columns plus the
    * per-constraint blame array and source batch id), complementing
    * the `GRAFT QUARANTINE` summary: triage queries ("which feeds
    * produce the violations", "sample 100 letters per constraint")
    * run as plain `spark.sql` over the view. Same
    * snapshot-at-registration isolation as the other views.
    */
  def registerQuarantine(spark: SparkSession, name: String,
                         tableDir: String): Unit =
    Ingest.readQuarantine(spark, tableDir)
      .createOrReplaceTempView(name)
}
