package graft

/** Session-lifetime memo for derive-once/consume-many artifacts (cluster
  * assignments, cell stats, synthetic media, near-dup cluster maps).
  *
  * Lifecycle (ADVICE r9): entries typically hold `localCheckpoint`'d
  * DataFrames whose blocks stay pinned for as long as the entry is
  * referenced, and the keys embed a fixture dir — so a long-lived JVM
  * cycling many dirs would grow without bound. Every memo created
  * through [[Memo.apply]] registers in a process-wide registry;
  * [[Memo.clearAll]] drops every entry so the ContextCleaner can
  * reclaim the checkpoint blocks once consumers release their frames.
  * `Verify` and `Bench` run one fixture dir per JVM and clear on exit;
  * an embedding application cycling dirs calls `clearAll()` between
  * them (or `clear()` on an individual memo).
  *
  * Compute runs under the memo's lock, so concurrent first callers for
  * the same key run the builder ONCE (a bare `TrieMap.getOrElseUpdate`
  * is not atomic — two racing callers could both run Lloyd's). The
  * fast path is a lock-free read; distinct keys do serialize their
  * builds, which is the right trade for builders that each saturate
  * the cluster anyway.
  */
final class Memo[K, V] private[graft] () {
  private val m = scala.collection.concurrent.TrieMap.empty[K, V]
  def getOrElseUpdate(k: K, compute: => V): V =
    m.get(k) match {
      case Some(v) => v
      case None    => synchronized(m.getOrElseUpdate(k, compute))
    }
  def clear(): Unit = m.clear()
  def size: Int = m.size
}

object Memo {
  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Memo[_, _]]()

  /** A new registered memo (cleared by [[clearAll]]). */
  def apply[K, V](): Memo[K, V] = {
    val x = new Memo[K, V]
    registry.add(x)
    x
  }

  /** Drop every entry of every registered memo. */
  def clearAll(): Unit = registry.forEach(_.clear())
}
