package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Ingest, LocalTableStore, TableStore}
import java.nio.file.Files

/** EXHAUSTIVE crash-window sweep of the upsert-table protocol: a
  * delegating [[TableStore]] dies just before its k-th mutating
  * control-plane op, for EVERY k until a batch completes uninjected —
  * so every between-steps window of the real protocol order (meta
  * pins, schema write, partial-build delete, bucket links, pointer
  * CAS, ledger append, retention sweep incl. the `_sweeping` marker,
  * feed publish links) is exercised, not just the hand-picked ones.
  * After each crash the spec asserts the THREE durable guarantees the
  * format's scaladoc argues in prose:
  *
  *   1. the crashed table still serves a committed snapshot — exactly
  *      the pre-batch state or (crash past the commit point) the
  *      post-batch state, never a torn mixture and never a
  *      half-deleted version's surviving fraction;
  *   2. replaying the SAME batch id converges to the exact final
  *      state — rows, ledger, and published feed all healed;
  *   3. the change feed for the batch reads back complete.
  *
  * Data-plane writes (Spark parquet jobs) are not failpointed; their
  * crash story is the unreferenced-partial-build argument, which the
  * k=partial-delete windows here do exercise on replay.
  */
class CrashWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private final class InjectedCrash extends RuntimeException("injected crash")

  /** Throws BEFORE the k-th mutating op (reads always pass through). */
  private final class FailpointStore(d: TableStore) extends TableStore {
    var limit: Int = Int.MaxValue
    var count: Int = 0
    private def gate(): Unit = {
      count += 1
      if (count > limit) throw new InjectedCrash
    }
    override def exists(p: String): Boolean = d.exists(p)
    override def isDirectory(p: String): Boolean = d.isDirectory(p)
    override def listNames(p: String): Seq[String] = d.listNames(p)
    override def lastModified(p: String): Long = d.lastModified(p)
    override def read(p: String): Option[String] = d.read(p)
    override def readLog(p: String): Seq[String] = d.readLog(p)
    override def mkdirs(p: String): Unit = { gate(); d.mkdirs(p) }
    override def writeAtomic(dir: String, n: String, b: String): Unit = {
      gate(); d.writeAtomic(dir, n, b)
    }
    override def putConditional(dir: String, n: String,
                                e: Option[String], b: String): Boolean = {
      gate(); d.putConditional(dir, n, e, b)
    }
    override def appendLog(p: String, l: String): Unit = { gate(); d.appendLog(p, l) }
    override def linkOrCopy(s: String, t: String): Unit = { gate(); d.linkOrCopy(s, t) }
    override def delete(p: String): Unit = { gate(); d.delete(p) }
    override def deleteTree(p: String): Unit = { gate(); d.deleteTree(p) }
  }

  test("every control-plane crash window serves committed state and replays clean") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val s0 = Map(1L -> 1.0, 2L -> 2.0)
      val s1 = Map(1L -> 11.0, 3L -> 3.0) // update 1, insert 3, delete 2
      var k = 0
      var exhausted = false
      var windows = 0
      while (!exhausted && k < 200) {
        implicit val store: FailpointStore = new FailpointStore(LocalTableStore)
        val table = Files.createTempDirectory("graft-crash").toString + "/t"
        def up(id: Long, rows: (Long, Double, Boolean)*): Unit =
          Ingest.upsertParquet(table, Seq("user_id"), nBuckets = 4,
            keepVersions = 1, deleteCol = Some("_del"), changeFeed = true)(
            rows.toDF("user_id", "value", "_del"), id)
        def state(): Map[Long, Double] =
          Ingest.readUpsertTable(spark, table)
            .select("user_id", "value").as[(Long, Double)].collect().toMap
        up(0, (1L, 1.0, false), (2L, 2.0, false)) // uninjected seed commit
        store.count = 0; store.limit = k
        val crashed =
          try { up(1, (1L, 11.0, false), (3L, 3.0, false), (2L, 0.0, true)); false }
          catch { case _: InjectedCrash => true }
        store.limit = Int.MaxValue
        if (!crashed) exhausted = true // k exceeded the protocol's op count
        else {
          windows += 1
          // 1. crashed state is committed — pre OR post, never torn
          val mid = state()
          assert(mid == s0 || mid == s1,
            s"window $k served a torn state: $mid")
          // 2. replay converges to the exact final state
          up(1, (1L, 11.0, false), (3L, 3.0, false), (2L, 0.0, true))
          assert(state() == s1, s"window $k replay diverged")
          val committed = store.readLog(store.child(table, "_commits"))
            .flatMap(l => scala.util.Try(l.trim.toLong).toOption).toSet
          assert(committed == Set(0L, 1L), s"window $k ledger: $committed")
          // 3. batch 1's change feed is complete (pre+post for 1,
          // insert for 3, delete for 2) and its slice was published
          assert(Ingest.readTableChanges(spark, table, 1, 1).count() === 4,
            s"window $k feed incomplete")
          val feed = store.listNames(store.child(table, "feed"))
          assert(Seq(0L, 1L).forall(b => feed.exists(_.startsWith(s"b$b-"))),
            s"window $k published feed not healed: $feed")
          LocalTableStore.deleteTree(table)
        }
        k += 1
      }
      assert(exhausted, "sweep never ran past the protocol's op count")
      info(s"$windows crash windows swept, all converged")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
