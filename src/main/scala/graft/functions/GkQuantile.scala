package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Greenwald–Khanna quantile summary — the missing member of
  * the sketch family next to HLL (`Extended`), count-min and Bloom
  * (`Sketches`): a fixed-small summary of a numeric column answering any
  * quantile within rank error ε·n, built per-partition and merged, so
  * the corpus never moves (ship sketches, not values — the same scale
  * argument as the CMS heavy-hitter path).
  *
  * Representation: the classic tuple list (v, g, Δ) sorted by value,
  * where rmin(vᵢ) = Σ_{j≤i} gⱼ and rmax(vᵢ) = rmin(vᵢ) + Δᵢ bound the
  * rank of vᵢ. Invariant after every compress: max(g+Δ) ≤ 2·ε·n, which
  * yields rank error ≤ ε·n for any quantile query (Greenwald & Khanna,
  * SIGMOD'01 — public algorithm).
  *
  * Inserts buffer into a batch; a full batch is sorted and merged in as
  * an exact summary (g=1, Δ=0). Merge combines rank BOUNDS — for a
  * tuple at value v from one side, the other side contributes
  * [rmin(last tuple ≤ v), rmax(first tuple > v) − 1] to the merged
  * [rmin, rmax] — so a merge never invents rank information and the
  * bound survives ANY merge tree shape (Spark's partition-merge order
  * is nondeterministic; correctness cannot depend on it). Per the
  * mergeable-summaries literature GK error can grow along a merge tree,
  * so callers build with ε a few times tighter than the contract they
  * check (the in-engine rank-ε contract in `Sketches.qQuantileSketch`
  * is the ground truth — if the bound ever broke, the boolean goes
  * false and the correctness gate flags it).
  */
final class GkSketch(private var _eps: Double) extends java.io.Externalizable {

  def this() = this(0.01) // Externalizable deserialization constructor

  def eps: Double = _eps

  // tuple list, sorted by value: vs(i) with weight gs(i) and spread ds(i)
  private var vs: Array[Double] = Array.emptyDoubleArray
  private var gs: Array[Long] = Array.emptyLongArray
  private var ds: Array[Long] = Array.emptyLongArray
  private var summarized: Long = 0L

  // raw-value staging batch — never serialized (flushed first; see
  // writeObject/readObject), so a shipped sketch is tuples only
  @transient private var buf: Array[Double] = new Array[Double](GkSketch.BatchSize)
  @transient private var bufLen: Int = 0

  def n: Long = summarized + bufLen

  def insert(v: Double): GkSketch = {
    buf(bufLen) = v
    bufLen += 1
    if (bufLen == buf.length) flush()
    this
  }

  /** Fold the raw-value buffer into the summary (batch = exact summary
    * with g=1, Δ=0), then compress to the ε invariant.
    */
  def flush(): Unit = {
    if (bufLen == 0) return
    val batch = java.util.Arrays.copyOf(buf, bufLen)
    java.util.Arrays.sort(batch)
    val bg = Array.fill(bufLen)(1L)
    val bd = new Array[Long](bufLen)
    mergeLists(batch, bg, bd, bufLen.toLong)
    bufLen = 0
    compress()
  }

  /** Merge `other` into this summary; returns this. Both buffers are
    * flushed first so the merge is summary-on-summary.
    */
  def merge(other: GkSketch): GkSketch = {
    flush()
    other.flush()
    if (other.summarized > 0) {
      mergeLists(other.vs, other.gs, other.ds, other.summarized)
      compress()
    }
    this
  }

  /** Core merge: combine this summary's tuples with another sorted
    * tuple list by adding rank bounds, under the consistent tie order
    * "all A elements of a value precede all B elements of that value"
    * (equal elements are interchangeable, so ONE global order may be
    * chosen and every bound computed against it). The loop consumes A
    * first on value ties, so when an A tuple at value v is emitted,
    * every consumed B tuple has value < v and the next unconsumed B
    * tuple is the first with value ≥ v; B then contributes
    * [rmin_B(consumed), rmax_B(next) − 1] to the A tuple's bounds —
    * and symmetrically for B tuples, whose equal-valued A tuples are
    * already consumed. Using the NEXT tuple (not the first strictly
    * greater) is what keeps tied runs from inflating Δ by the run
    * length. New rmin/rmax are the sums of both sides' bounds; both are
    * monotone along the merged order, so the g deltas are non-negative
    * and Σg = n_A + n_B.
    */
  private def mergeLists(ovs: Array[Double], ogs: Array[Long],
                         ods: Array[Long], on: Long): Unit = {
    if (summarized == 0) {
      vs = ovs.clone(); gs = ogs.clone(); ds = ods.clone()
      summarized = on
      return
    }
    val an = summarized
    val asz = vs.length
    val bsz = ovs.length
    val mvs = new Array[Double](asz + bsz)
    val mrmin = new Array[Long](asz + bsz)
    val mrmax = new Array[Long](asz + bsz)
    var ia = 0; var ib = 0; var out = 0
    var rminA = 0L; var rminB = 0L // cumulative rmin of last consumed tuple per side
    while (ia < asz || ib < bsz) {
      val takeA = ib >= bsz || (ia < asz && vs(ia) <= ovs(ib))
      if (takeA) {
        rminA += gs(ia)
        val ub = if (ib < bsz) rminB + ogs(ib) + ods(ib) - 1 else on
        mvs(out) = vs(ia)
        mrmin(out) = rminA + rminB
        mrmax(out) = rminA + ds(ia) + ub
        ia += 1
      } else {
        rminB += ogs(ib)
        val ub = if (ia < asz) rminA + gs(ia) + ds(ia) - 1 else an
        mvs(out) = ovs(ib)
        mrmin(out) = rminB + rminA
        mrmax(out) = rminB + ods(ib) + ub
        ib += 1
      }
      out += 1
    }
    val nvs = new Array[Double](out)
    val ngs = new Array[Long](out)
    val nds = new Array[Long](out)
    var prev = 0L
    var i = 0
    while (i < out) {
      nvs(i) = mvs(i)
      ngs(i) = mrmin(i) - prev
      nds(i) = mrmax(i) - mrmin(i)
      prev = mrmin(i)
      i += 1
    }
    vs = nvs; gs = ngs; ds = nds
    summarized = an + on
  }

  /** Drop tuples whose mass fits into their right neighbour without
    * breaking the invariant g + Δ ≤ 2·ε·n. One left-to-right pass; the
    * last tuple (the max) is never absorbed, and absorbing into the
    * right keeps every surviving tuple's rmin/rmax unchanged.
    */
  private def compress(): Unit = {
    if (vs.length <= 2) return
    val threshold = math.max(1L, (2.0 * eps * summarized).toLong)
    val keepV = new Array[Double](vs.length)
    val keepG = new Array[Long](vs.length)
    val keepD = new Array[Long](vs.length)
    var out = 0
    var carry = 0L
    var i = 0
    while (i < vs.length - 1) {
      val g = gs(i) + carry
      if (g + gs(i + 1) + ds(i + 1) <= threshold) {
        carry = g // absorb tuple i into its right neighbour
      } else {
        keepV(out) = vs(i); keepG(out) = g; keepD(out) = ds(i)
        out += 1
        carry = 0L
      }
      i += 1
    }
    keepV(out) = vs(vs.length - 1)
    keepG(out) = gs(vs.length - 1) + carry
    keepD(out) = ds(vs.length - 1)
    out += 1
    vs = java.util.Arrays.copyOf(keepV, out)
    gs = java.util.Arrays.copyOf(keepG, out)
    ds = java.util.Arrays.copyOf(keepD, out)
  }

  /** Value whose rank is within ε_eff·n of φ·n, where ε_eff is the
    * summary's realized error max(g+Δ)/(2n) — the standard GK query
    * rule.
    */
  def query(phi: Double): Double = {
    flush()
    require(summarized > 0, "empty sketch")
    val r = math.max(1L, math.ceil(phi * summarized).toLong)
    val e = {
      var m = 0L; var i = 0
      while (i < vs.length) { m = math.max(m, gs(i) + ds(i)); i += 1 }
      (m + 1) / 2
    }
    var rmin = 0L
    var i = 0
    while (i < vs.length) {
      rmin += gs(i)
      if (rmin + ds(i) > r + e) return vs(math.max(0, i - 1))
      i += 1
    }
    vs(vs.length - 1)
  }

  /** Number of stored tuples — the "driver-sized summary" claim,
    * probed by GkQuantileSpec.
    */
  def size: Int = { flush(); vs.length }

  /** Realized rank slack e of the summary — any [[query]] result's
    * rank is within ±e of its target rank (the same e `query` uses
    * internally). Lets callers size sketch-guided search bands off the
    * ACHIEVED error instead of the looser construction ε.
    */
  def rankSlack: Long = {
    flush()
    var m = 0L
    var i = 0
    while (i < vs.length) { m = math.max(m, gs(i) + ds(i)); i += 1 }
    (m + 1) / 2
  }

  /** Compact binary form: header (eps, n, tuple count) + the three
    * primitive arrays — 24·size + 20 bytes, no object-stream class
    * descriptors or reflection metadata (VERDICT r8 item 4). A
    * serialized sketch carries tuples only, never the raw-value
    * staging buffer (flushed first).
    */
  override def writeExternal(out: java.io.ObjectOutput): Unit = {
    flush()
    out.writeDouble(_eps)
    out.writeLong(summarized)
    out.writeInt(vs.length)
    var i = 0
    while (i < vs.length) {
      out.writeDouble(vs(i)); out.writeLong(gs(i)); out.writeLong(ds(i))
      i += 1
    }
  }

  override def readExternal(in: java.io.ObjectInput): Unit = {
    _eps = in.readDouble()
    summarized = in.readLong()
    val len = in.readInt()
    vs = new Array[Double](len)
    gs = new Array[Long](len)
    ds = new Array[Long](len)
    var i = 0
    while (i < len) {
      vs(i) = in.readDouble(); gs(i) = in.readLong(); ds(i) = in.readLong()
      i += 1
    }
    buf = new Array[Double](GkSketch.BatchSize)
    bufLen = 0
  }

  private[functions] def packTuples(bb: java.nio.ByteBuffer): Unit = {
    var i = 0
    while (i < vs.length) {
      bb.putDouble(vs(i)); bb.putLong(gs(i)); bb.putLong(ds(i))
      i += 1
    }
  }

  private[functions] def unpackFrom(bb: java.nio.ByteBuffer): Unit = {
    _eps = bb.getDouble()
    summarized = bb.getLong()
    val len = bb.getInt()
    vs = new Array[Double](len)
    gs = new Array[Long](len)
    ds = new Array[Long](len)
    var i = 0
    while (i < len) {
      vs(i) = bb.getDouble(); gs(i) = bb.getLong(); ds(i) = bb.getLong()
      i += 1
    }
    bufLen = 0
  }
}

object GkSketch {
  val BatchSize = 4096

  /** Pure packed form (same layout as [[GkSketch.writeExternal]], no
    * java-serialization envelope at all) — what `finish` emits into
    * result columns.
    */
  def toBytes(sk: GkSketch): Array[Byte] = {
    val n = sk.size // flushes
    val bb = java.nio.ByteBuffer.allocate(20 + 24 * n)
    bb.putDouble(sk.eps).putLong(sk.n).putInt(n)
    sk.packTuples(bb)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): GkSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sk = new GkSketch()
    sk.unpackFrom(bb)
    sk
  }
}

/** The GK summary as a Spark `Aggregator`: per-partition `reduce` folds
  * raw values, cross-partition `merge` combines summaries — exactly the
  * mergeable-buffer shape `count_min_sketch` has natively. Register with
  * `functions.udaf` for untyped `agg` calls.
  */
final class GkQuantileAgg(eps: Double)
    extends Aggregator[Double, GkSketch, Array[Byte]] {
  override def zero: GkSketch = new GkSketch(eps)
  override def reduce(b: GkSketch, a: Double): GkSketch = b.insert(a)
  override def merge(x: GkSketch, y: GkSketch): GkSketch = x.merge(y)
  override def finish(b: GkSketch): Array[Byte] = GkSketch.toBytes(b)
  // the java-serialization envelope now carries GkSketch's packed
  // Externalizable payload (three primitive arrays + header), not
  // field-reflection metadata
  override def bufferEncoder: Encoder[GkSketch] =
    Encoders.javaSerialization[GkSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
