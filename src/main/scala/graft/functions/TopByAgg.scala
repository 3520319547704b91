package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-`cap` selection — the partial-aggregation
  * replacement for `row_number().over(partitionBy(g).orderBy(...)) <= s`
  * in the ANN scans (VERDICT r10 item 4).
  *
  * The window form is correct but sorts EVERY group's full candidate
  * stream through one shuffle: at 10⁹ corpus rows a probe's slice is
  * the corpus, and the sort is the scan's cost. Selection, unlike
  * ranking, is aggregatable: each map-side partition folds its rows
  * into a size-`cap` heap (O(rows · log cap), constant memory), the
  * shuffle moves only `partitions × cap` entries per group, and the
  * final merge is heap-union. Same membership, same order: the
  * comparator is exactly the window's `(score [DESC|ASC],
  * id ASC)` — the exactness twins that share the brute-force oracle
  * pin the equivalence bit-for-bit.
  *
  * State is a classic binary heap with the WORST kept element at the
  * root (a candidate enters by beating the root). `largest = true`
  * keeps the highest scores (cosine top-k), `false` the lowest
  * (Hamming shortlists). Ties break toward the smaller id — the
  * deterministic total order every rank site in the repo uses.
  */
final class TopByState(private var _cap: Int, private var _largest: Boolean)
    extends java.io.Externalizable {
  def this() = this(0, true) // Externalizable deserialization constructor
  def cap: Int = _cap
  def largest: Boolean = _largest
  var n: Int = 0
  // grown on demand (doubling, bounded by cap): an "unbounded"
  // exactness-twin cap (corpus-sized or Int.MaxValue) must cost what
  // the group actually holds, not what the cap allows
  var scores: Array[Double] = new Array[Double](math.min(math.max(cap, 1), 16))
  var ids: Array[Long] = new Array[Long](scores.length)

  private def ensure(room: Int): Unit =
    if (room > scores.length) {
      val sz = math.min(cap.toLong, math.max(scores.length.toLong * 2, room.toLong)).toInt
      scores = java.util.Arrays.copyOf(scores, sz)
      ids = java.util.Arrays.copyOf(ids, sz)
    }

  /** Is (sa, ia) worse — further from selection — than (sb, ib)?
    * Score comparison follows Spark's SQL ordering exactly: NaN is the
    * LARGEST double (so with `largest = true` a NaN candidate always
    * enters, with `false` it never beats a real score), NaN ties with
    * NaN, and -0.0 ties with 0.0 (IEEE `!=`, not a signed total order)
    * — the window this replaces ranked with that same ordering, so the
    * bit-for-bit equivalence holds on NaN-scored inputs too.
    */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val an = java.lang.Double.isNaN(sa); val bn = java.lang.Double.isNaN(sb)
    if (an != bn) { if (largest) bn else an } // NaN is the largest score
    else if (!an && sa != sb) { if (largest) sa < sb else sa > sb }
    else ia > ib
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def insert(s: Double, id: Long): TopByState = {
    if (cap <= 0) return this
    if (n < cap) {
      ensure(n + 1)
      scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id; siftDown(0)
    }
    this
  }

  def merge(other: TopByState): TopByState = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
    this
  }

  /** Kept entries, best first — position i is the group's rank-(i+1)
    * row under the window's ordering. Sorted with [[worse]] itself so
    * the NaN placement matches the comparator that built the heap.
    */
  def result: Seq[(Double, Long)] =
    (0 until n)
      .sortWith((a, b) => worse(scores(b), ids(b), scores(a), ids(a)))
      .map(j => (scores(j), ids(j)))

  // Packed Externalizable payload (the GkSketch discipline): the
  // java-serialization envelope around this class carries a header +
  // two primitive arrays instead of the default field-by-field object
  // graph — the partial→final hop of every ANN aggregation pays this
  // cost once per group per partition (VERDICT r11 item 5).
  override def writeExternal(out: java.io.ObjectOutput): Unit = {
    out.writeInt(_cap); out.writeBoolean(_largest); out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1 }
  }

  override def readExternal(in: java.io.ObjectInput): Unit = {
    _cap = in.readInt(); _largest = in.readBoolean(); n = in.readInt()
    scores = new Array[Double](math.max(n, 1))
    ids = new Array[Long](scores.length)
    var i = 0
    while (i < n) { scores(i) = in.readDouble(); ids(i) = in.readLong(); i += 1 }
  }
}

/** `udaf(new TopByAgg(s, largest), TopByAgg.inputEncoder)` → a UDAF of
  * `(score: double, id: bigint)` returning `array<struct<_1: double,
  * _2: bigint>>`, best first.
  */
final class TopByAgg(cap: Int, largest: Boolean)
    extends Aggregator[(Double, Long), TopByState, Seq[(Double, Long)]] {
  override def zero: TopByState = new TopByState(cap, largest)
  override def reduce(b: TopByState, a: (Double, Long)): TopByState =
    b.insert(a._1, a._2)
  override def merge(x: TopByState, y: TopByState): TopByState = x.merge(y)
  override def finish(b: TopByState): Seq[(Double, Long)] = b.result
  override def bufferEncoder: Encoder[TopByState] =
    Encoders.javaSerialization[TopByState]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    TopByAgg.outEncoder
}

object TopByAgg {
  val inputEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  private[functions] val outEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
