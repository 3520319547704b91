package graft.sources

/** Control-plane filesystem seam under the upsert table format
  * ([[Ingest.upsertParquet]] and friends) and [[StatsManifest]].
  *
  * The format separates two I/O planes:
  *
  *   - the DATA plane — parquet snapshot/manifest/feed files — always
  *     goes through Spark (`spark.read.parquet(path)` / `df.write`),
  *     i.e. Hadoop `FileSystem`, so it already speaks whatever scheme
  *     the path carries;
  *   - the CONTROL plane — the `CURRENT` pointer, the `_commits`
  *     ledger, `_meta`/`_schema`/`_cdf`/`_constraints` properties,
  *     version-dir listing/cleanup, hard-link forwarding — is what
  *     this trait abstracts. The local impl ([[LocalTableStore]])
  *     preserves the exact POSIX semantics the format's crash-safety
  *     argument was proven against; a remote impl ports the format to
  *     an object store or HDFS by meeting the contract below.
  *
  * Paths are plain strings (joined with [[child]], never
  * `java.io.File` — URI schemes must survive joining) and must be
  * readable by Spark's data plane under the same string.
  *
  * == What a remote (S3/HDFS) impl must provide ==
  *
  *   - [[writeAtomic]]: readers must never observe a partial object —
  *     local = write tmp + `ATOMIC_MOVE` rename; S3 = a single PUT (PUTs
  *     are atomic); HDFS = temp file + rename.
  *   - [[putConditional]]: the commit-pointer swap. MUST be an atomic
  *     compare-and-set on the object's current content for multi-writer
  *     safety — S3 = conditional PUT (`If-Match` on the read ETag /
  *     `If-None-Match: *` for the first write); HDFS = create-exclusive
  *     lock file or rename-based CAS. The local impl can only make the
  *     check-then-rename atomic WITHIN one JVM (a monitor around
  *     read+rename); cross-process it is best-effort — the window
  *     shrinks to microseconds, and the format's single-writer contract
  *     plus the loud [[java.util.ConcurrentModificationException]] on
  *     detection cover the rest. This method is exactly where a
  *     conditional-put store turns the format's optimistic concurrency
  *     from best-effort to airtight.
  *   - [[appendLog]]/[[readLog]]: the append-only ledgers (`_commits`,
  *     `_empty`). Local = `O_APPEND` line writes (a torn trailing line
  *     parses as garbage and degrades to "uncommitted" — safe). Object
  *     stores have no append: implement the log as ONE OBJECT PER ENTRY
  *     (e.g. `_commits.d/<id>` empty markers) — `readLog` is then a
  *     prefix LIST, append is a PUT, both atomic, and duplicate appends
  *     stay idempotent exactly as the line-file is.
  *   - [[linkOrCopy]]: version-to-version file sharing. Local = hard
  *     link (zero I/O, byte-identical by inode); stores without links
  *     = server-side copy (S3 CopyObject) — correctness is unaffected,
  *     only the zero-I/O sharing is lost. A manifest-based remote impl
  *     may instead reference the SAME object from both versions and
  *     make [[deleteTree]] reference-counting — the format only
  *     requires that the destination path serves the source's bytes
  *     and survives the source version's deletion.
  *   - [[listNames]]/[[isDirectory]]/[[exists]]: LIST-prefix and HEAD.
  *     Listing a non-existent dir returns empty, never throws.
  *   - [[lastModified]]: any monotone-enough clock for the retention
  *     grace window (object stores: the object's Last-Modified).
  *   - [[deleteTree]]/[[delete]]: recursive and single delete; absent
  *     paths are a no-op. [[mkdirs]] may be a no-op on stores without
  *     directories.
  */
trait TableStore {

  /** Join a child name onto a directory path, scheme-preserving
    * (`java.io.File` would collapse `s3://`).
    */
  def child(dir: String, name: String): String =
    if (dir.endsWith("/")) dir + name else dir + "/" + name

  /** Last path segment. */
  def baseName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  def exists(path: String): Boolean
  def isDirectory(path: String): Boolean

  /** Immediate children NAMES of `dir` (not paths); empty when `dir`
    * is absent or not a directory.
    */
  def listNames(dir: String): Seq[String]

  /** Millis of last modification; 0 when absent. */
  def lastModified(path: String): Long

  def mkdirs(path: String): Unit

  /** Full content of a small control file; None when absent. */
  def read(path: String): Option[String]

  /** Write `dir/name` such that a concurrent reader sees the old
    * content or the new, never a partial (see contract above).
    */
  def writeAtomic(dir: String, name: String, body: String): Unit

  /** Compare-and-set `dir/name`: publish `body` iff the current
    * content is `expect` (None = must not exist). Returns false —
    * publishing NOTHING — when the content moved. See the contract
    * above for the atomicity each backend must provide.
    *
    * The comparison is on WHITESPACE-TRIMMED content (and an
    * empty-after-trim object equals None): callers build `expect` from
    * a trimmed read, and a stray trailing newline from external
    * tooling must degrade to a normal CAS, not a permanent
    * "moved from X to X" conflict. Remote impls comparing by
    * version/ETag instead of content satisfy this trivially.
    *
    * POINTER-ONLY CONTRACT: that normalization makes "object absent"
    * and "object exists but whitespace-empty" indistinguishable — a
    * create-if-absent (`expect = None`) put overwrites an existing
    * empty object. Safe for the one caller this method exists for
    * (the `CURRENT` swap: pointer bodies are non-empty `v_<id>` names
    * and an empty pointer is debris to reclaim), WRONG for a generic
    * CAS where an empty object is meaningful state (e.g. a lock
    * file). Do not grow new callers onto this method; a future
    * generic CAS needs its own primitive with strict byte (or
    * ETag/version) comparison.
    */
  def putConditional(dir: String, name: String,
                     expect: Option[String], body: String): Boolean

  /** OPTIONAL capability: atomically create `dir/name` with `body`
    * iff NO object exists there — STRICT presence semantics (an
    * existing empty object counts as present, unlike
    * [[putConditional]]'s trimmed pointer-only contract). Returns
    * `Some(true)` created, `Some(false)` already present, or `None`
    * where the backend has no exclusive-create primitive — callers
    * MUST then fall back to their documented read-then-append path
    * (and keep that fallback correct-enough on its own, since `None`
    * is always a legal answer). Backends: S3 = `If-None-Match: *`
    * conditional PUT; HDFS/POSIX = create-exclusive
    * (`CREATE_NEW` / `CreateFlag.CREATE` without overwrite). The one
    * intended caller is [[Ingest.createTag]]'s per-name mutex.
    */
  def createExclusive(dir: String, name: String,
                      body: String): Option[Boolean] = None

  /** Append one entry to an append-only log (see contract above). */
  def appendLog(path: String, line: String): Unit

  /** All entries of an append-only log; empty when absent. Torn or
    * foreign lines are returned verbatim — callers parse defensively.
    */
  def readLog(path: String): Seq[String]

  /** Make `dstFile` serve `srcFile`'s bytes without rewriting them
    * where the backend allows (hard link / server-side copy); plain
    * copy otherwise. No-op semantics are NOT part of the contract —
    * callers guard existence themselves where idempotence matters.
    */
  def linkOrCopy(srcFile: String, dstFile: String): Unit

  /** Delete a file; absent = no-op. */
  def delete(path: String): Unit

  /** Delete a tree recursively; absent = no-op. */
  def deleteTree(path: String): Unit
}

object TableStore {
  /** Default store: local POSIX semantics — what every call site gets
    * unless a caller supplies its own impl.
    */
  implicit val local: TableStore = LocalTableStore
}

/** The local-filesystem [[TableStore]]: today's exact semantics —
  * `O_APPEND` ledgers, tmp+`ATOMIC_MOVE` pointer swaps, hard-link
  * version sharing with copy fallback, and a JVM-level monitor making
  * [[putConditional]] a true CAS within one process (cross-process it
  * is best-effort, as documented on the trait).
  */
object LocalTableStore extends TableStore {
  private def f(path: String) = new java.io.File(path)
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  override def exists(path: String): Boolean = f(path).exists()
  override def isDirectory(path: String): Boolean = f(path).isDirectory

  override def listNames(dir: String): Seq[String] =
    Option(f(dir).list()).map(_.toSeq).getOrElse(Nil)

  override def lastModified(path: String): Long = f(path).lastModified

  override def mkdirs(path: String): Unit = { f(path).mkdirs(); () }

  override def read(path: String): Option[String] = {
    val p = f(path)
    if (!p.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(p.toPath), utf8))
  }

  override def writeAtomic(dir: String, name: String, body: String): Unit =
    // under the same monitor as putConditional: an in-JVM writer
    // racing the CAS's read+rename window would otherwise let the CAS
    // succeed against a stale read (cross-process stays best-effort,
    // as documented on the trait)
    synchronized {
      val tmp = f(child(dir, name + ".tmp"))
      java.nio.file.Files.write(tmp.toPath, body.getBytes(utf8))
      java.nio.file.Files.move(tmp.toPath, f(child(dir, name)).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }

  override def putConditional(dir: String, name: String,
                              expect: Option[String], body: String): Boolean =
    synchronized {
      // trimmed comparison per the trait contract
      val have = read(child(dir, name)).map(_.trim).filter(_.nonEmpty)
      if (have != expect.map(_.trim).filter(_.nonEmpty)) false
      else { writeAtomic(dir, name, body); true }
    }

  override def createExclusive(dir: String, name: String,
                               body: String): Option[Boolean] = {
    f(dir).mkdirs()
    // CREATE_NEW is atomic cross-process on POSIX — a true exclusive
    // create, stronger than putConditional's in-JVM-monitor CAS
    try {
      java.nio.file.Files.write(f(child(dir, name)).toPath,
        body.getBytes(utf8),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      Some(true)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => Some(false)
    }
  }

  override def appendLog(path: String, line: String): Unit = {
    val out = new java.io.FileWriter(f(path), true)
    try out.write(line + "\n") finally out.close()
  }

  override def readLog(path: String): Seq[String] = {
    val p = f(path)
    if (!p.exists()) Nil
    else {
      val src = scala.io.Source.fromFile(p)
      try src.getLines().toList finally src.close()
    }
  }

  override def linkOrCopy(srcFile: String, dstFile: String): Unit = {
    val dst = f(dstFile).toPath
    try java.nio.file.Files.createLink(dst, f(srcFile).toPath)
    catch {
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        java.nio.file.Files.copy(f(srcFile).toPath, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  override def delete(path: String): Unit = { f(path).delete(); () }

  override def deleteTree(path: String): Unit = {
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) {
        val kids = Option(x.listFiles()).map(_.toSeq).getOrElse(Nil)
        // the `_sweeping` half-delete marker goes LAST: listFiles()
        // order is unspecified, and a crash mid-sweep must leave the
        // dir still marked (Ingest.sweepDir's crash-safety argument)
        val (markers, rest) = kids.partition(_.getName == "_sweeping")
        (rest ++ markers).foreach(rm)
      }
      x.delete(); ()
    }
    rm(f(path))
  }
}
