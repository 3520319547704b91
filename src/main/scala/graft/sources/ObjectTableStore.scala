package graft.sources

import scala.jdk.CollectionConverters._

/** A [[TableStore]] with STRICT object-store semantics — the machine
  * check behind the format's portability claim (VERDICT r11 item 1),
  * and the porting template for a real S3/GCS backend.
  *
  * The local impl quietly enjoys POSIX powers an object store does not
  * have; this one forbids every crutch, so any format code that
  * silently relies on one fails the parameterized IngestSpec battery
  * instead of failing in production on S3:
  *
  *   - NO APPEND: ledgers are ONE OBJECT PER ENTRY under
  *     `<path>.d/<seq>` ([[appendLog]] = a PUT, [[readLog]] = a prefix
  *     LIST) — exactly the layout the trait contract prescribes for
  *     stores without `O_APPEND`;
  *   - NO RENAME: [[writeAtomic]] is a single whole-object put (a map
  *     put here; an S3 PUT is atomic by itself) — no tmp file, no
  *     `ATOMIC_MOVE`;
  *   - NO HARD LINKS: [[linkOrCopy]] is a byte copy (server-side
  *     CopyObject on S3) — version-to-version sharing must survive
  *     losing the zero-I/O inode trick;
  *   - CAS-ONLY pointer swaps: [[putConditional]] compares the current
  *     object content under a monitor (an S3 conditional PUT /
  *     `If-Match` — airtight there, airtight here in-JVM).
  *
  * Control-plane objects (CURRENT, `_meta`, `_schema`, ledgers, gen
  * markers) live ONLY in an in-process map — they never touch the
  * filesystem, so any code path that reaches around the seam (a direct
  * `java.io.File` read of CURRENT, a `FileWriter` append to
  * `_commits`) sees nothing and fails loudly. The DATA plane (parquet
  * snapshot/feed files Spark reads and writes) stays on the real
  * filesystem, merged into [[exists]]/[[listNames]]/[[isDirectory]]/
  * [[deleteTree]] exactly the way an object store merges "directories"
  * it infers from key prefixes with the objects under them.
  * [[mkdirs]] remains a real mkdir solely because the LOCAL data plane
  * (plain-filesystem copies) needs parents to exist; a remote impl
  * makes it the no-op the contract allows.
  */
final class ObjectTableStore extends TableStore {
  // path -> (body, lastModifiedMs); the "bucket" of control objects
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def fs = LocalTableStore // DATA-plane view (Spark-written files)
  private def logPrefix(path: String) = path + ".d/"

  override def exists(path: String): Boolean =
    objects.containsKey(path) ||
      objects.keySet.asScala.exists(k =>
        k.startsWith(path + "/") || k.startsWith(logPrefix(path))) ||
      fs.exists(path)

  override def isDirectory(path: String): Boolean =
    fs.isDirectory(path) ||
      objects.keySet.asScala.exists(_.startsWith(path + "/"))

  override def listNames(dir: String): Seq[String] = {
    val p = if (dir.endsWith("/")) dir else dir + "/"
    val mem = objects.keySet.asScala.toSeq.filter(_.startsWith(p))
      .map(_.substring(p.length).takeWhile(_ != '/'))
    (fs.listNames(dir) ++ mem).distinct
  }

  override def lastModified(path: String): Long =
    if (fs.exists(path)) fs.lastModified(path)
    else Option(objects.get(path)).map(_._2).getOrElse {
      // logical dir: newest child object (a prefix has no mtime of its own)
      val p = path + "/"
      objects.asScala.collect { case (k, (_, t)) if k.startsWith(p) => t }
        .maxOption.getOrElse(0L)
    }

  override def mkdirs(path: String): Unit = fs.mkdirs(path)

  override def read(path: String): Option[String] =
    Option(objects.get(path)).map(_._1) // control objects ONLY — no fs fallback

  override def writeAtomic(dir: String, name: String, body: String): Unit =
    // under the same monitor as putConditional: an unsynchronized put
    // landing between the CAS's read and its write would let the CAS
    // succeed against a stale read — the lost-update the conditional
    // put exists to prevent (S3's If-Match serializes against plain
    // PUTs server-side; the in-JVM double must too)
    synchronized {
      objects.put(child(dir, name), (body, System.currentTimeMillis())); ()
    }

  override def putConditional(dir: String, name: String,
                              expect: Option[String], body: String): Boolean =
    synchronized { // the conditional PUT: compare-and-set on trimmed content
      val key = child(dir, name)
      val have = Option(objects.get(key)).map(_._1.trim).filter(_.nonEmpty)
      if (have != expect.map(_.trim).filter(_.nonEmpty)) false
      else { objects.put(key, (body, System.currentTimeMillis())); true }
    }

  override def createExclusive(dir: String, name: String,
                               body: String): Option[Boolean] =
    synchronized {
      // the S3 `If-None-Match: *` conditional PUT: STRICT presence —
      // an existing empty object is present (no trimming, unlike the
      // pointer-only putConditional)
      val key = child(dir, name)
      if (objects.containsKey(key)) Some(false)
      else {
        objects.put(key, (body, System.currentTimeMillis()))
        Some(true)
      }
    }

  override def appendLog(path: String, line: String): Unit = {
    objects.put(logPrefix(path) + f"${seq.incrementAndGet()}%019d",
      (line, System.currentTimeMillis())); ()
  }

  override def readLog(path: String): Seq[String] = {
    val p = logPrefix(path)
    objects.asScala.toSeq.collect { case (k, (v, _)) if k.startsWith(p) => k -> v }
      .sortBy(_._1).map(_._2)
  }

  /** Test hook: drop every entry of log `path` whose LEADING TOKEN is
    * `line` (entries may carry trailing annotations — txn=/ts=) —
    * simulates the crash window where a commit record was lost.
    */
  def dropLogEntries(path: String, line: String): Unit = {
    val p = logPrefix(path)
    objects.asScala.foreach { case (k, (v, _)) =>
      if (k.startsWith(p) && v.trim.split("\\s+")(0) == line)
        objects.remove(k)
    }
  }

  override def linkOrCopy(srcFile: String, dstFile: String): Unit = {
    // server-side copy; NEVER a hard link
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(srcFile), java.nio.file.Paths.get(dstFile),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING); ()
  }

  override def delete(path: String): Unit = {
    objects.remove(path)
    val p = logPrefix(path)
    objects.keySet.asScala.filter(_.startsWith(p)).foreach(objects.remove)
    fs.delete(path)
  }

  override def deleteTree(path: String): Unit = {
    // DATA plane first, control objects LAST: the `_sweeping`
    // half-delete marker (an in-memory control object here) must
    // outlive every data file, so a crash mid-delete leaves the dir
    // still marked and never servable — deleting control keys first
    // would re-open the silently-partial as-of window the marker closes
    fs.deleteTree(path)
    objects.remove(path)
    val p1 = path + "/"; val p2 = logPrefix(path)
    objects.keySet.asScala
      .filter(k => k.startsWith(p1) || k.startsWith(p2))
      .foreach(objects.remove)
  }
}
