package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.sources.Tables

/** Distributed BPE (byte-pair-encoding) vocabulary TRAINING — the
  * tokenizer-building step of an LLM data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"), expressed Spark-first.
  *
  * The trick that makes BPE distributable: after pre-tokenization the
  * algorithm never needs the corpus again — only the WORD-FREQUENCY
  * TABLE (distinct word → count). One shuffle builds that table from
  * any corpus size; every merge iteration is then a narrow flatMap +
  * one aggregation over the vocab-sized table (millions of rows at
  * 100 TB, not trillions), and the only driver-side row per iteration
  * is the argmax pair. Lineage is truncated with persist-swap +
  * periodic localCheckpoint so a long merge schedule cannot build an
  * unbounded plan.
  *
  * Determinism: pair selection breaks count ties lexicographically
  * (left, then right), so the learned merge table is a pure function
  * of the corpus — the property the spec gates and the oracle row's
  * stability depends on.
  */
object Bpe {

  /** End-of-word sentinel (the classic `</w>`): lets a merge that
    * closes a word ("e" + "</w>") be distinct from a word-internal
    * one, and makes detokenization lossless.
    */
  val Eow = "</w>"

  /** Word-frequency table of a corpus: `(w, cnt)` — ONE shuffle over
    * the documents; everything after rides this table.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  private def toSymbols(w: String): Seq[String] =
    w.map(_.toString) :+ Eow

  /** Replace every adjacent (l, r) with the merged symbol l+r —
    * left-to-right, non-overlapping (the standard BPE merge order).
    */
  private[operators] def mergePair(syms: Seq[String], l: String,
                                   r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `numMerges` BPE merges over `docs(textCol)`. Returns the
    * ordered merge table `(rank, left, right, pair_count)`; training
    * stops early when no pair occurs at least `minPairCount` times
    * (the vocabulary is saturated). Cost shape per iteration: one
    * narrow flatMap over the word table (pairs weighted by word
    * count), one hash aggregation, one single-row argmax to the
    * driver, one narrow map applying the merge.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainOnWords(
      wordCounts(docs, textCol).as[(String, Long)]
        .map { case (w, c) => (toSymbols(w), c) },
      numMerges, minPairCount)
  }

  private def trainOnWords(words0: Dataset[(Seq[String], Long)],
                           numMerges: Int, minPairCount: Long)
      : Seq[(Int, String, String, Long)] = {
    val spark = words0.sparkSession
    import spark.implicits._
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var cur = words0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cur.count()
    var rank = 0
    var done = false
    try {
      while (rank < numMerges && !done) {
        // weighted adjacent-pair counts over the WORD TABLE (narrow +
        // one agg) — the corpus is long gone
        val best = cur.flatMap { case (syms, c) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1))
            .map { case (a, b) => ((a, b), c) }
        }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .map { case ((l, r), c) => (l, r, c) }
          .toDF("l", "r", "c")
          // deterministic argmax: count desc, then lexicographic
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect() // exactly one row per iteration
        if (best.isEmpty || best.head.getLong(2) < minPairCount) done = true
        else {
          val (l, r, c) =
            (best.head.getString(0), best.head.getString(1),
              best.head.getLong(2))
          merges += ((rank, l, r, c))
          val next0 = cur.map { case (syms, cnt) =>
            (mergePair(syms, l, r), cnt) }
          // persist-swap truncates nothing by itself — every 8 merges
          // localCheckpoint cuts the map-chain lineage for real
          val next =
            (if ((rank + 1) % 8 == 0) next0.localCheckpoint(false)
             else next0)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          cur.unpersist()
          cur = next
          rank += 1
        }
      }
      merges.toSeq
    } finally { cur.unpersist(); () }
  }

  /** Encode a single word with an ordered merge table (rank order =
    * application order, all occurrences per rank — the canonical BPE
    * inference rule). Exposed for the executor-side closures and the
    * spec's reference comparison.
    */
  def encodeWord(w: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(toSymbols(w)) { case (syms, (l, r)) =>
      if (syms.length < 2) syms else mergePair(syms, l, r) }

  /** Tokenize a corpus with a trained merge table: one narrow map per
    * document (the merge table broadcasts with the closure; no
    * shuffle). Returns `(doc_id, tokens)` with `tokens` the full BPE
    * symbol sequence of the whitespace-lowered text.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = merges.toIndexedSeq
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition word cache: the merge fold is a pure function
        // of the WORD, and corpora are Zipfian — without this every
        // occurrence of "the" re-runs the whole merge schedule. The
        // cache is vocab-sized (Heap's law), with a hard cap as the
        // adversarial-corpus backstop (past it, rare words just
        // re-encode)
        val cache = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        def enc(w: String): Seq[String] =
          cache.getOrElse(w, {
            val s = encodeWord(w, m)
            if (cache.size < (1 << 20)) cache.update(w, s)
            s
          })
        it.map { case (id, t) =>
          val toks = t.toLowerCase.split("\\s+").iterator
            .filter(_.nonEmpty)
            .flatMap(enc).toSeq
          (id, toks)
        }
      }.toDF("doc_id", "tokens")
  }

  // --- oracle rows -------------------------------------------------

  // one training run per (session, fixture, schedule): the encode row
  // reuses the train row's table instead of re-clustering the corpus
  private val trainMemo =
    graft.Memo[(SparkSession, String, Int), Seq[(Int, String, String, Long)]]()

  private def trainedMerges(spark: SparkSession, dir: String,
                            numMerges: Int): Seq[(Int, String, String, Long)] =
    trainMemo.getOrElseUpdate((spark, dir, numMerges),
      train(Tables.load(spark, dir, "documents"), "text", numMerges))

  /** BPE training over the documents fixture: the first 40 learned
    * merges. No SQL engine can express the iterative argmax, so the
    * row is rows-only BY DESIGN; its gates are (a) determinism — the
    * merge table is a pure function of the corpus (count-desc,
    * lexicographic tie-break), so the row is bit-stable across runs
    * and SFs hash identically per SF, and (b) BpeSpec, which pins the
    * distributed trainer against an independent sequential reference
    * implementation merge-for-merge and checks the saturation stop.
    */
  val qBpeTrain: QuerySpec = QuerySpec(
    "q_bpe_train",
    None,
    (spark, dir) => {
      import spark.implicits._
      trainedMerges(spark, dir, 40)
        .toDF("rank", "left", "right", "pair_count")
        .orderBy("rank")
    })

  /** Encoding with the learned vocabulary, gated by IN-QUERY
    * contracts DuckDB cannot check but arithmetic can: (a)
    * LOSSLESSNESS — detokenizing every document's BPE stream (concat
    * tokens, strip `</w>` into spaces) reproduces the lowered
    * whitespace-normalized text exactly, for every row; (b)
    * COMPRESSION — the merge table strictly shrinks the stream vs
    * character tokenization on the corpus total. Output is the
    * per-language token statistics of the encoded corpus.
    */
  val qBpeEncode: QuerySpec = QuerySpec(
    "q_bpe_encode",
    None,
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val merges = trainedMerges(spark, dir, 40).map(m => (m._2, m._3))
      val enc = encode(docs, "doc_id", "text", merges)
      val joined = docs.select(col("doc_id").cast("long").as("doc_id"),
          col("lang"), col("text"))
        .join(enc, "doc_id")
        .withColumn("norm_text",
          // the encoder's view of the document: lowered, whitespace
          // collapsed to single spaces, trimmed
          trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .withColumn("detok",
          // tokens concatenated; each </w> closes a word -> space
          trim(regexp_replace(
            concat_ws("", col("tokens")), java.util.regex.Pattern.quote(Eow),
            " ")))
        .withColumn("lossless", col("detok") === col("norm_text"))
        .withColumn("n_tokens", size(col("tokens")))
        .withColumn("n_chars",
          length(regexp_replace(col("norm_text"), " ", "")))
      val bad = joined.filter(!col("lossless")).count()
      require(bad == 0L, s"BPE detokenization lost $bad documents")
      val totals = joined.agg(sum("n_tokens").as("t"),
        sum("n_chars").as("c")).head()
      require(totals.getLong(0) < totals.getLong(1),
        "BPE merges did not compress vs character tokenization")
      joined.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          round(avg("n_tokens"), 4).as("avg_tokens"),
          min(col("lossless").cast("int")).as("all_lossless"))
        .orderBy("lang")
    })

  def specs: Seq[QuerySpec] = Seq(qBpeTrain, qBpeEncode)
}
