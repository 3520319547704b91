package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference platform (CDCgov/SDP) provisions a single-node MySQL 5.6
  * data tier (`openshift_resources/db-templates/mysql-persistent-template.json:68`);
  * this engine replaces it with a distributed Spark SQL tier. Session
  * defaults are chosen for oracle parity (DuckDB, ANSI, UTC, binary
  * collation) and for scale (AQE on, CBO-friendly, partition counts sized
  * to cores locally — on a real cluster these come from the deploy conf).
  */
object GraftSession {

  /** Apply graft engine defaults to an existing builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    // custom Catalyst expressions (graft_cosine_sim, …) for SQL entry
    .withExtensions(new GraftExtensions)
    // Deterministic, oracle-compatible semantics.
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "true")
    // Adaptive execution: runtime coalescing, skew-join splitting,
    // broadcast-join demotion/promotion — the main lever that keeps the
    // same plan viable from sf0.001 to 100 TB.
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // Cost-based optimizer (SURVEY §4 join-reorder commitment): uses
    // ANALYZE TABLE stats when present (Tables.analyzeAll in Bench);
    // with no stats it falls back to size-based estimates + AQE.
    .config("spark.sql.cbo.enabled", "true")
    .config("spark.sql.cbo.joinReorder.enabled", "true")
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader has no timestamp type for; read as long and let the reader
    // facade (Tables) convert to micros explicitly.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ContextCleaner only reclaims unreferenced cache/checkpoint blocks
    // when a GC actually runs; the 30-min default periodic GC means a
    // long session (the 151-query × 3-rep bench) accumulates every
    // memoized artifact's dropped blocks in old-gen until a full GC
    // stalls some unlucky query for seconds. Two minutes bounds the
    // backlog at negligible GC cost.
    .config("spark.cleaner.periodicGC.interval", "2min")
    .config("spark.ui.enabled", "false")
    // Scratch I/O on the fast ephemeral tier (tmpfs locally, local
    // NVMe on a cluster): shuffle/spill files, and the default
    // checkpoint root for streaming queries that don't pin their own —
    // state-store commits fsync every micro-batch, and that latency is
    // pure scaffolding cost (see graft.Scratch).
    .config("spark.local.dir", Scratch.dir("spark-local"))
    .config("spark.sql.streaming.checkpointLocation", Scratch.dir("stream-ck"))
    // Catalog-native graft tables: `graft.ns.tbl` multipart names,
    // CREATE/ALTER/DROP TABLE, VERSION/TIMESTAMP AS OF — the default
    // warehouse is session scratch; deployments point it at durable
    // storage (spark.sql.catalog.graft.warehouse).
    .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.graft.warehouse", Scratch.dir("graft-warehouse"))

  /** Local session used by tests and ad-hoc mains. `cores` threads, and
    * shuffle partitions sized to cores (not the 200 default, which just
    * makes tiny local shuffles slower).
    */
  def local(appName: String, cores: Int = 32): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
