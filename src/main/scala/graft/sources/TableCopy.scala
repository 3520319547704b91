package graft.sources

import org.apache.spark.sql.SparkSession

/** Byte-exact table-tree copy, and the derive-once/copy-per-consumer
  * fixture discipline built on it (OPTIMIZATION r16, guide §1/§2: the
  * bench's mutating table-format rows each re-folded a multi-batch
  * churned table per rep — ~6–10 s of fixture BUILD around a 1–3 s
  * measured operator. The fold is setup, not the operator those rows
  * exist to time, so it runs ONCE per (session, fixture, shape) into a
  * pristine tree and every rep receives a fresh copy to mutate).
  *
  * Why a copy is sound to mutate while the pristine survives:
  *
  *   - the format is copy-on-write — data files (parquet snapshots,
  *     feed slices, deletion vectors, stats manifests) are IMMUTABLE
  *     once committed, so they are shared as hard links
  *     ([[TableStore.linkOrCopy]]): a later merge/OPTIMIZE/VACUUM on
  *     the copy only creates new files or UNLINKS — it never writes
  *     through a shared inode;
  *   - pointer-class control files (`CURRENT`, `_meta`, `_schema`,
  *     `_cdf`, `_constraints`, `_colmap`, `_nbuckets`, …) are only
  *     ever replaced via [[TableStore.writeAtomic]] (write-tmp +
  *     rename), which rebinds the copy's directory entry and leaves
  *     the shared inode to the pristine — link-safe too;
  *   - the ONLY in-place mutation in the format is
  *     [[TableStore.appendLog]] (`O_APPEND`) on the `_commits` /
  *     `_empty` / `_tags` ledgers — those are byte-COPIED, never
  *     linked, so an append on the copy cannot reach the pristine.
  *
  * Timestamps: hard links share the pristine's mtime. The format reads
  * mtimes only for opt-in retention GRACE windows (`graceMs`, default
  * 0) — no declared query row opts in, and fixture copies are consumed
  * within one bench process.
  */
object TableCopy {

  /** The append-mutated ledgers ([[TableStore.appendLog]] targets) —
    * the one file class that must be deep-copied, not linked. Must
    * stay closed under the format's FULL ledger set: `_txns` is the
    * MultiCommit coordinator ledger (ADVICE r16 — a coordinator dir
    * inside a copied tree would otherwise share an inode with the
    * pristine and an append on the copy would corrupt it).
    */
  private val appendLogs = Set("_commits", "_empty", "_tags", "_txns")

  /** Recursively copy the table tree at `src` to `dst`: directories
    * recreated, append-logs byte-copied, every other file hard-linked
    * (copy fallback per [[TableStore.linkOrCopy]]).
    */
  def copyTree(src: String, dst: String)(implicit store: TableStore): Unit = {
    store.mkdirs(dst)
    store.listNames(src).foreach { n =>
      val s = store.child(src, n)
      if (store.isDirectory(s)) copyTree(s, store.child(dst, n))
      else if (appendLogs(n))
        store.read(s).foreach(b => store.writeAtomic(dst, n, b))
      else store.linkOrCopy(s, store.child(dst, n))
    }
  }

  private val pristineMemo = graft.Memo[(SparkSession, String, String), String]()

  /** Build-once / copy-per-call fixture: `build` materializes the
    * fixture table at the given path ONCE per (session, fixture dir,
    * tag); every call returns a FRESH link-copy the caller may mutate
    * freely. Local-store only (the seam hard links); non-local fixture
    * builders keep their own memoization.
    */
  def fresh(spark: SparkSession, dir: String, tag: String)
           (build: String => Unit): String = {
    implicit val store: TableStore = TableStore.local
    val pristine = pristineMemo.getOrElseUpdate((spark, dir, tag), {
      val p = graft.Scratch.dir(s"$tag-pristine") + "/table"
      build(p)
      p
    })
    val t = graft.Scratch.dir(tag) + "/table"
    copyTree(pristine, t)
    t
  }
}
