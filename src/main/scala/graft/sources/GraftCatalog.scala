package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark [[TableCatalog]] over a warehouse directory of graft
  * tables — catalog-NATIVE spellings for everything the path-based
  * format already does:
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /warehouse/dir
  *
  * CREATE NAMESPACE graft.lab
  * CREATE TABLE graft.lab.obs (k BIGINT, v INT)
  *   TBLPROPERTIES ('keys'='k')                -- provider implied
  * INSERT INTO graft.lab.obs VALUES (1, 10)    -- one committed batch
  * SELECT * FROM graft.lab.obs VERSION AS OF 0 -- ledgered time travel
  * SELECT * FROM graft.lab.obs TIMESTAMP AS OF '2026-08-16 12:00:00'
  * ALTER TABLE graft.lab.obs RENAME COLUMN v TO val  -- metadata-only
  * }}}
  *
  * Identity and layout: identifier `ns…/name` IS the directory
  * `warehouse/ns…/name` — the catalog adds NO second metastore; the
  * table's own control plane (`_meta`/`_schema`/`_commits`) stays the
  * single source of truth, so path-based `format("graft")` readers and
  * catalog readers of the same directory can never disagree. Planning
  * cost is one directory listing per catalog call — no data I/O.
  *
  * Time travel: `VERSION AS OF n` pins ledgered batch id `n` (exact —
  * the id space users already hold tags and CDC offsets in).
  * `TIMESTAMP AS OF t` resolves through the `ts=` wall-clock
  * annotation each commit appends atomically with its ledger entry
  * ([[Ingest.batchAtTimestamp]]); commits from builds predating the
  * annotation count as arbitrarily old, which is chronologically true.
  *
  * Deliberate refusals: `renameTable` (the identifier IS the path —
  * renaming would silently break external path-based readers, tags
  * and checkpoints holding the old directory), partition transforms
  * (the format's bucket layout is pinned by `keys`/`buckets`
  * properties, not by Spark partitioning), and property/column-type
  * mutations outside RENAME/DROP COLUMN (the format's schema evolves
  * through its own verbs).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catName: String = _
  private var warehouse: String = _
  private implicit var store: TableStore = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    store = Option(options.get("store")).getOrElse("local") match {
      case "local" => TableStore.local
      case "hadoop" => new HadoopTableStore()
      case other => throw new IllegalArgumentException(
        s"graft catalog: unknown store '$other' (local | hadoop)")
    }
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name': set spark.sql.catalog.$name.warehouse"))
    store.mkdirs(warehouse)
  }

  override def name(): String = catName

  // one path segment per namespace level + the table name; segments
  // must never traverse (the identifier IS the directory)
  private def segOk(s: String): Boolean =
    s.nonEmpty && s != "." && s != ".." && !s.contains("/") &&
      !s.contains("\\") && !s.startsWith("_")

  private def dirOf(parts: Seq[String]): String = {
    require(parts.forall(segOk),
      s"graft catalog: illegal identifier segment in ${parts.mkString(".")}" +
        " (no /, \\, ., .., or leading _)")
    parts.foldLeft(warehouse)(store.child)
  }

  private def tableDir(ident: Identifier): String =
    dirOf(ident.namespace().toIndexedSeq :+ ident.name())

  private def isTable(dir: String): Boolean =
    store.exists(store.child(dir, "_meta"))

  private def spark: SparkSession = SparkSession.active

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = dirOf(namespace.toIndexedSeq)
    if (!store.isDirectory(ns)) throw new NoSuchNamespaceException(
      catName +: namespace)
    store.listNames(ns).filter(n => segOk(n) && isTable(store.child(ns, n)))
      .sorted.map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tableDir(ident))

  private def loadAt(ident: Identifier, asOf: Option[Long]): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    // per-WRITER options the create pinned for catalog users
    // (keepversions, deletecol) — layout properties live in the
    // table's own _meta; these ride a small _catalog sidecar so
    // INSERT INTO through the catalog keeps the declared retention
    val pinned = store.read(store.child(dir, "_catalog")).toSeq
      .flatMap(_.linesIterator).map(_.trim).filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    val base = pinned ++ Map("path" -> dir) ++
      asOf.map(v => "versionasof" -> v.toString)
    val provider = new GraftSource()
    val schema = provider.inferSchema(
      new CaseInsensitiveStringMap(base.asJava))
    provider.getTable(schema, Array.empty, base.asJava)
  }

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** `VERSION AS OF <n>` — ledgered batch id, exact. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(scala.util.Try(version.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog: VERSION AS OF takes a ledgered batch id, " +
          s"got '$version' (tags: read with option(\"tag\", …))"))))

  /** `TIMESTAMP AS OF <t>` — Spark hands epoch MICROS. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    loadAt(ident, Some(Ingest.batchAtTimestamp(dir, timestamp / 1000L)))
  }

  /** CREATE TABLE — materializes the table's own control plane at once
    * by committing batch 0 EMPTY (the format serves zero-data-file
    * snapshots as typed empty tables), so the directory is immediately
    * a first-class graft table for path-based readers too. `keys` is
    * the one required property; `buckets`, `sortCols`, `changeFeed`
    * tune the pinned layout.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String])
      : Table = {
    require(partitions.isEmpty,
      "graft catalog: PARTITIONED BY is not supported — the format's " +
        "bucket layout is pinned by the 'keys'/'buckets' properties")
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    val keys = props.get("keys").toSeq.flatMap(_.split(","))
      .map(_.trim).filter(_.nonEmpty)
    require(keys.nonEmpty,
      "graft catalog: CREATE TABLE needs TBLPROPERTIES ('keys'='k1,k2')" +
        " — the format merges by key")
    require(keys.forall(schema.fieldNames.contains),
      s"graft catalog: keys ${keys.mkString(",")} must be table columns")
    val sortCols = props.get("sortcols").toSeq.flatMap(_.split(","))
      .map(_.trim).filter(_.nonEmpty)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Ingest.upsertParquet(dir, keys,
      nBuckets = props.get("buckets").map(_.toInt).getOrElse(16),
      keepVersions = props.get("keepversions").map(_.toInt).getOrElse(2),
      changeFeed = props.get("changefeed").exists(_.toBoolean),
      sortCols = sortCols)(empty, 0L)
    // pin the per-writer options for every later catalog write
    val sidecar = Seq("keepversions", "deletecol")
      .flatMap(k => props.get(k).map(v => s"$k=$v"))
    if (sidecar.nonEmpty)
      store.writeAtomic(dir, "_catalog", sidecar.mkString("\n"))
    loadTable(ident)
  }

  /** ALTER TABLE — exactly the format's metadata-only column verbs
    * (RENAME COLUMN / DROP COLUMN, through the same `_colmap` path as
    * `GRAFT ALTER`); anything else is refused loudly rather than
    * half-applied.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames().length == 1,
          "graft catalog: nested column renames are not supported")
        Ingest.renameColumn(dir, r.fieldNames()(0), r.newName())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1,
          "graft catalog: nested column drops are not supported")
        Ingest.dropColumn(dir, d.fieldNames()(0))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER ${other.getClass.getSimpleName}" +
          " — the format evolves schema via RENAME/DROP COLUMN and its" +
          " own GRAFT verbs")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else { store.deleteTree(dir); true }
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: RENAME TABLE is refused — the identifier IS the " +
        "storage path, and renaming it would break path-based readers, " +
        "tags and stream checkpoints holding the old directory. CLONE " +
        "to a new identifier instead.")

  // ---- namespaces -----------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    store.listNames(warehouse)
      .filter(n => segOk(n) && store.isDirectory(store.child(warehouse, n))
        && !isTable(store.child(warehouse, n)))
      .sorted.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val ns = dirOf(namespace.toIndexedSeq)
    if (!store.isDirectory(ns)) throw new NoSuchNamespaceException(
      catName +: namespace)
    store.listNames(ns)
      .filter(n => segOk(n) && store.isDirectory(store.child(ns, n)) &&
        !isTable(store.child(ns, n)))
      .sorted.map(n => namespace :+ n).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val d = dirOf(namespace.toIndexedSeq)
      store.isDirectory(d) && !isTable(d)
    }

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catName +: namespace)
    Map(SupportsNamespaces.PROP_LOCATION ->
      dirOf(namespace.toIndexedSeq)).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String])
      : Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(catName +: namespace)
    store.mkdirs(dirOf(namespace.toIndexedSeq))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val d = dirOf(namespace.toIndexedSeq)
    if (!namespaceExists(namespace)) false
    else {
      if (!cascade) require(store.listNames(d).isEmpty,
        s"graft catalog: namespace ${namespace.mkString(".")} is not " +
          "empty — DROP … CASCADE to remove its tables")
      store.deleteTree(d); true
    }
  }
}
