package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the manifest layer every
  * lakehouse table format (Delta/Iceberg/Hudi) puts between the query
  * and the file listing, and the consumer of the tight per-file value
  * ranges that [[graft.operators.Layout]]'s Z-order write produces.
  *
  * Why it exists at 100 TB: parquet row-group stats prune WITHIN a
  * file, but the reader still has to open every footer — a
  * 100 TB table is millions of files, and footer-open round trips
  * (object-store GETs) dominate a selective query. A manifest holds
  * one row per file with min/max per stats column, so planning prunes
  * the FILE LIST before any footer is touched: a 2-D range probe over
  * a Z-clustered table goes from "open every footer" to "open the few
  * files whose bounding box overlaps the probe".
  *
  * The manifest is derived, not authoritative — it is rebuilt from the
  * data on write, lives under `_stats/` inside the table dir
  * (underscore-prefixed, so Spark's file listing never surfaces it to
  * snapshot reads), and a lost manifest degrades to a full scan, never
  * a wrong answer (pruning is sound: a file is skipped only when its
  * min/max range provably misses the predicate).
  */
object StatsManifest {

  val ManifestDir = "_stats"

  /** Resolve a recorded data-file path onto the manifest's OWN
    * location. The manifest's `file` column holds `input_file_name()`
    * URIs from the original write — but a table tree may legitimately
    * move under the format's own contracts (the r16 fixture
    * link-copies; a future table relocation), and a recorded absolute
    * path would then point a pruned read at the ORIGINAL tree: the
    * basePath-keyed readers fail loudly, the set-membership consumers
    * ([[graft.sources.GraftTable]]'s pruning) would silently intersect
    * to an EMPTY file list — dropped rows, not a superset. The suffix
    * below the version-dir segment is location-independent, so rebase
    * every recorded path at the LAST occurrence of the version dir's
    * name (deepest match — partition dirs are `bkt=N`/`col=val` and
    * can never collide with it). A path without the marker (e.g. a
    * clone's renamed version dir) passes through unchanged — exactly
    * the pre-rebase behavior.
    */
  private[sources] def rebase(manifestDir: String, f: String)
                             (implicit store: TableStore): String = {
    val vDir =
      if (manifestDir.endsWith("/" + ManifestDir))
        manifestDir.dropRight(ManifestDir.length + 1)
      else manifestDir
    // r17: new manifests record VERSION-RELATIVE paths ([[relFile]]) —
    // no marker search needed, resolution is direct child-of-vDir
    if (!f.startsWith("/") && !f.contains(":/")) return store.child(vDir, f)
    val marker = "/" + store.baseName(vDir) + "/"
    val i = f.lastIndexOf(marker)
    if (i >= 0) store.child(vDir, f.substring(i + marker.length)) else f
  }

  /** Version-RELATIVE `file` expression for manifest WRITERS: the
    * suffix of `input_file_name()` below the named version dir
    * (`bkt=N/part-….parquet`). Written relative, a relocated or
    * link-copied tree's manifest resolves with zero path surgery —
    * the whole `input_file_name()`-URI failure class the r16
    * rebase-at-read fix papered over is gone at the source; [[rebase]]
    * keeps serving absolute paths from manifests written before this
    * (and a clone's renamed version dir, which passes through).
    */
  def relFile(versionDirName: String): Column =
    regexp_replace(input_file_name(),
      ".*/" + java.util.regex.Pattern.quote(versionDirName) + "/", "")

  /** The per-file manifest row's aggregate list: `min_<c>` / `max_<c>`
    * per stats column — the skipping index — plus `n_rows` and
    * `nulls_<c>`, which upgrade the manifest from a skipping index to
    * an AGGREGATION source ([[graft.sources.Ingest.countWhere]] /
    * [[graft.sources.Ingest.minMaxMeta]]): a file whose value range
    * lies strictly inside a predicate and whose bound columns hold no
    * NULLs contributes its row count from metadata alone, no data I/O.
    * One definition shared by every manifest writer (the plain-dir
    * [[writeWithStats]] path and the table format's sink / optimize /
    * rebucket rewrites) so manifests stay schema-compatible across the
    * carry/union paths.
    */
  def statsAggs(statsCols: Seq[String]): Seq[Column] =
    statsCols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))) :+
      count(lit(1)).as("n_rows")

  /** Footer-derived manifest rows for freshly written parquet files —
    * the zero-rescan path behind every manifest writer (r17, guide §6):
    * the min/max/null-count/row-count a manifest row needs is already
    * in each file's parquet footer, so deriving it there replaces a
    * full re-read of the just-written data (a second pass over every
    * rewritten byte — at 100 TB, a second scan of the commit's output)
    * with one footer read per file, the same metadata pass Delta and
    * Iceberg do at write time.
    *
    * Returns `None` — callers MUST fall back to the scan-based
    * derivation — unless every stats column in every file yields EXACT
    * statistics. Exactness matters beyond pruning: [[Ingest.minMaxMeta]]
    * answers MIN/MAX *aggregates* from these rows, so an approximate
    * bound (parquet truncates/omits long BINARY stats) would be a wrong
    * answer, not a missed skip. Hence only fixed-width physical types
    * are accepted (int32/int64/float/double/boolean, date, timestamp
    * micros/millis) — their footer stats are attained values by format
    * contract; strings, decimals and INT96 timestamps decline to the
    * scan. Footers are read through the same Hadoop FS the data plane
    * writes through, so any [[TableStore]] whose parquet Spark can read
    * serves footers too.
    *
    * @param files (absolutePath, manifestRelativePath) per data file
    * @param schema the table's data schema (stats columns resolved here)
    */
  def footerManifestRows(spark: SparkSession,
                         files: Seq[(String, String)],
                         statsCols: Seq[String],
                         schema: org.apache.spark.sql.types.StructType)
      : Option[DataFrame] = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val fields = statsCols.map(c => schema.fields.find(_.name == c)
      .getOrElse(return None))
    val supported = fields.forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType | DateType | TimestampType => true
      case _ => false
    })
    if (!supported || files.isEmpty) return None
    // decode one footer Statistics value into the Spark-external value
    // the scan-based agg would have produced; None = unusable stats
    def decode(v: Any, dt: DataType,
               pt: org.apache.parquet.schema.PrimitiveType): Option[Any] =
      (dt, pt.getPrimitiveTypeName) match {
        case (ByteType, INT32) => Some(v.asInstanceOf[Int].toByte)
        case (ShortType, INT32) => Some(v.asInstanceOf[Int].toShort)
        case (IntegerType, INT32) => Some(v.asInstanceOf[Int])
        case (LongType, INT64) => Some(v.asInstanceOf[Long])
        case (FloatType, FLOAT) => Some(v.asInstanceOf[Float])
        case (DoubleType, DOUBLE) => Some(v.asInstanceOf[Double])
        case (BooleanType, BOOLEAN) => Some(v.asInstanceOf[Boolean])
        case (DateType, INT32) =>
          Some(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
        case (TimestampType, INT64) =>
          pt.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              val raw = v.asInstanceOf[Long]
              val micros = t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MICROS => raw
                case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
                case _ => return None // nanos: not TimestampType-exact
              }
              Some(java.time.Instant.ofEpochSecond(
                Math.floorDiv(micros, 1000000L),
                Math.floorMod(micros, 1000000L) * 1000L))
            case _ => None
          }
        case _ => None // INT96 timestamps and any other mismatch
      }
    val conf = spark.sessionState.newHadoopConf()
    val rows = files.map { case (abs, rel) =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(abs), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val nRows = blocks.map(_.getRowCount).sum
        val perCol: Seq[Seq[Any]] = fields.map { fld =>
          var mn: Any = null
          var mx: Any = null
          var nulls = 0L
          blocks.foreach { b =>
            val cc = b.getColumns.asScala
              .find(_.getPath.toDotString == fld.name).getOrElse(return None)
            val st = cc.getStatistics
            if (st == null || st.isEmpty || !st.isNumNullsSet) return None
            nulls += st.getNumNulls
            if (st.hasNonNullValue) {
              val lo = decode(st.genericGetMin, fld.dataType,
                cc.getPrimitiveType).getOrElse(return None)
              val hi = decode(st.genericGetMax, fld.dataType,
                cc.getPrimitiveType).getOrElse(return None)
              def lt(a: Any, b: Any): Boolean =
                a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
              if (mn == null || lt(lo, mn)) mn = lo
              if (mx == null || lt(mx, hi)) mx = hi
            } else if (st.getNumNulls != b.getRowCount) {
              // no min/max but not provably all-NULL either (INT96
              // writes exactly this shape: numNulls=0, no values) —
              // treating it as all-null would give the file NULL
              // bounds and pruned reads would SKIP live rows. Bail.
              return None
            }
          }
          Seq(mn, mx, nulls)
        }
        org.apache.spark.sql.Row.fromSeq(rel +: perCol.flatten :+ nRows)
      } finally reader.close()
    }
    val outSchema = StructType(
      StructField("file", StringType, nullable = false) +:
      fields.flatMap(f => Seq(
        StructField(s"min_${f.name}", f.dataType),
        StructField(s"max_${f.name}", f.dataType),
        StructField(s"nulls_${f.name}", LongType))) :+
      StructField("n_rows", LongType, nullable = false))
    Some(spark.createDataFrame(rows.asJava, outSchema))
  }

  /** Write `df` as parquet at `path` — the caller controls layout
    * (partitioning/sorting decide how tight the per-file ranges are;
    * a Z-clustered input gives multi-column-tight boxes) — then build
    * the per-file manifest for `statsCols`: one row per data file with
    * `min_<c>` / `max_<c>` for each stats column.
    *
    * The stats pass re-reads ONLY the stats columns of the
    * just-written files (column pruning makes this a narrow columnar
    * scan) and reduces per file via one hash agg on
    * `input_file_name()` — fully distributed, no driver-side footer
    * walk. A production variant could lift the same numbers straight
    * out of the parquet footers; deriving them from the data keeps the
    * path engine-portable and exactly as correct.
    */
  def writeWithStats(df: DataFrame, path: String,
                     statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "writeWithStats: no stats columns")
    df.write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val written = spark.read.parquet(path)
      .select(statsCols.map(col): _*)
    val aggs = statsAggs(statsCols)
    val dirName = path.replaceAll("/+$", "").split('/').last
    written
      .groupBy(relFile(dirName).as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // one manifest row per data file — manifest is tiny
      .write.mode("overwrite").parquet(s"$path/$ManifestDir")
  }

  /** Scan `path` reading ONLY the files whose manifest range can
    * contain a row matching every `(column, lo, hi)` bound — file-list
    * pruning from the manifest, before any data (or footer) I/O. The
    * returned frame still holds all rows OF THOSE FILES: callers apply
    * their row-level predicate on top (skipping is a superset
    * guarantee, like partition pruning).
    *
    * A file is kept iff `max_c >= lo AND min_c <= hi` for every bound —
    * the bounding-box overlap test; an all-NULL stats column yields
    * NULL min/max, which fails the overlap test exactly as 3-valued
    * logic requires (no non-null row in that file can match a range).
    * The only driver-side materialization is the surviving FILE LIST —
    * bounded by file count, the same thing any manifest-based format's
    * planner holds. An empty survivor set returns a typed empty scan.
    */
  def prunedScan(spark: SparkSession, path: String,
                 bounds: Seq[(String, Any, Any)])
                (implicit store: TableStore): DataFrame = {
    // the manifest dir is underscore-prefixed so TABLE reads never see
    // it; reading it back therefore names its part files explicitly
    // (a leading-underscore path handed to the reader is otherwise
    // subject to the same hidden-file filtering that protects it)
    val files = survivingFiles(spark, store.child(path, ManifestDir), bounds)
      .getOrElse(throw new IllegalArgumentException(
        s"no stats manifest under $path/$ManifestDir — write the table " +
          "with writeWithStats"))
    if (files.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.option("basePath", path).parquet(files: _*)
  }

  /** The bounding-box overlap test against a manifest directory: the
    * data files whose `[min_c, max_c]` range can contain a row
    * matching every `(c, lo, hi)` bound. `None` when no manifest
    * exists (caller decides whether that degrades to a full scan or
    * fails). Shared by [[prunedScan]] and the upsert table's
    * stats-pruned read (`Ingest.readUpsertTableWhere`). The only
    * driver-side materialization is the surviving file list.
    */
  def survivingFiles(spark: SparkSession, manifestDir: String,
                     bounds: Seq[(String, Any, Any)])
                    (implicit store: TableStore): Option[Seq[String]] =
    survivingFilesOpt(spark, manifestDir,
      bounds.map { case (c, lo, hi) => (c, Some(lo), Some(hi)) })

  /** [[survivingFiles]] with OPEN-ended bounds: `None` for an endpoint
    * means unbounded on that side (`c >= lo` alone, or `c <= hi`
    * alone). The DataSource filter pushdown needs this shape — a
    * pushed `date >= x` has no upper endpoint but still skips every
    * file whose `max_date < x`. Same superset guarantee: a file whose
    * min/max are NULL (all rows NULL in `c`) is skipped, which is
    * sound because a NULL never satisfies a range predicate.
    */
  def survivingFilesOpt(spark: SparkSession, manifestDir: String,
                        bounds: Seq[(String, Option[Any], Option[Any])])
                       (implicit store: TableStore): Option[Seq[String]] = {
    val mparts = store.listNames(manifestDir)
      .filter(_.endsWith(".parquet")).map(store.child(manifestDir, _))
    if (mparts.isEmpty) None
    else {
      val manifest = spark.read.parquet(mparts: _*)
      val keep = bounds.foldLeft(manifest) { case (m, (c, lo, hi)) =>
        val m1 = lo.map(v => m.filter(col(s"max_$c") >= lit(v))).getOrElse(m)
        hi.map(v => m1.filter(col(s"min_$c") <= lit(v))).getOrElse(m1)
      }
      Some(keep.select("file").collect()
        .map(r => rebase(manifestDir, r.getString(0))).toSeq)
    }
  }

  /** Per-file row counts from the manifest — the limit-pushdown
    * truncation's coverage ledger. `None` when no manifest exists or
    * it predates the `n_rows` column (pre-upgrade manifests must
    * DECLINE truncation, not guess).
    */
  def fileRowCounts(spark: SparkSession, manifestDir: String)
                   (implicit store: TableStore): Option[Map[String, Long]] = {
    if (!store.isDirectory(manifestDir)) return None
    val mparts = store.listNames(manifestDir)
      .filter(_.endsWith(".parquet")).map(store.child(manifestDir, _))
    if (mparts.isEmpty) None
    else {
      val m = spark.read.parquet(mparts: _*)
      if (!m.schema.fieldNames.contains("n_rows")) None
      else Some(m.select("file", "n_rows").collect()
        .map(r => rebase(manifestDir, r.getString(0)) -> r.getLong(1)).toMap)
    }
  }

  /** Point-set overlap test: the data files whose `[min_c, max_c]` box
    * can contain ANY of `values` (per-value containment OR'd, tighter
    * than the single `[min(values), max(values)]` envelope when the
    * set is sparse across a sorted layout). Runtime join pruning ships
    * its broadcast-collected key set here — values are bounded by the
    * broadcast threshold by construction. Same superset guarantee as
    * [[survivingFilesOpt]]; `None` when no manifest exists.
    */
  def survivingFilesIn(spark: SparkSession, manifestDir: String,
                       column: String, values: Seq[Any])
                      (implicit store: TableStore): Option[Seq[String]] = {
    val mparts = store.listNames(manifestDir)
      .filter(_.endsWith(".parquet")).map(store.child(manifestDir, _))
    if (mparts.isEmpty) None
    else {
      val manifest = spark.read.parquet(mparts: _*)
      val hit = values.map(v =>
          col(s"min_$column") <= lit(v) && col(s"max_$column") >= lit(v))
        .reduceOption(_ || _).getOrElse(lit(false))
      Some(manifest.filter(hit)
        .select("file").collect()
        .map(r => rebase(manifestDir, r.getString(0))).toSeq)
    }
  }
}
