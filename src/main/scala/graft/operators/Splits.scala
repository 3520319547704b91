package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines
  * (SURVEY.md §2.11 adjunct): hash-based, not RNG-based — the split a
  * row lands in depends only on its key, so it is stable across runs,
  * cluster layouts, and incremental re-processing (a re-ingested
  * document lands in the same split it did last month, which RNG
  * `randomSplit` cannot promise).
  */
object Splits {

  /** Bucket in [0, 100) derived from the key column. */
  def splitBucket(key: Column, salt: String = "graft-split-v1"): Column =
    pmod(xxhash64(lit(salt), key), lit(100L))

  /** (train, test) with approximately `testPct`% held out, keyed. */
  def trainTest(df: DataFrame, key: String, testPct: Int): (DataFrame, DataFrame) = {
    val b = splitBucket(col(key))
    (df.filter(b >= testPct), df.filter(b < testPct))
  }

  /** (train, test) via the engine-portable md5 bucket — byte-identical
    * in any engine, so the exact member sets are oracle-checkable
    * (VERDICT r2 item 4). [[trainTest]] (xxhash64) stays as the faster
    * Spark-only variant; SplitsSpec asserts both are disjoint+exhaustive.
    */
  def trainTestPortable(df: DataFrame, key: String, testPct: Int): (DataFrame, DataFrame) = {
    val b = portableBucket(col(key).cast("string"), "graft-split-v1")
    (df.filter(b >= testPct), df.filter(b < testPct))
  }

  /** Oracle-checked split: per-split sizes + member-set extremes, exact
    * in DuckDB via the same md5 arithmetic.
    */
  val qTrainTestSplit: QuerySpec = QuerySpec(
    "q_train_test_split",
    Some("""SELECT split, count(*) AS n,
        CAST(min(doc_id) AS BIGINT) AS min_doc,
        CAST(max(doc_id) AS BIGINT) AS max_doc
      FROM (SELECT doc_id,
        CASE WHEN CAST(('0x' || substr(md5('graft-split-v1' || '|' ||
          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20
        THEN 'test' ELSE 'train' END AS split
        FROM documents)
      GROUP BY split ORDER BY split"""),
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val (train, test) = trainTestPortable(docs, "doc_id", testPct = 20)
      train.select(lit("train").as("split"), col("doc_id"))
        .unionByName(test.select(lit("test").as("split"), col("doc_id")))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
        .orderBy("split")
    })

  /** Engine-PORTABLE bucket in [0, 100): md5 is identical everywhere, so
    * unlike [[splitBucket]] (xxhash64 — Spark-specific, faster) this
    * split can be reproduced byte-for-byte by any other engine a
    * pipeline hands data to — and it is oracle-checkable.
    */
  def portableBucket(key: Column, salt: String = "graft-sample-v1"): Column =
    (conv(substring(md5(concat_ws("|", lit(salt), key)), 1, 8), 16, 10)
      .cast("long") % 100).cast("int")

  /** Deterministic 10% sample of lineitem, reproduced exactly by the
    * DuckDB oracle — proof the sample is a pure function of the data.
    */
  val qSampleHash: QuerySpec = QuerySpec(
    "q_sample_hash",
    Some("""SELECT l_orderkey, l_linenumber FROM lineitem
      WHERE CAST(('0x' || substr(md5('graft-sample-v1' || '|' ||
        CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
        % 100 < 10
      ORDER BY l_orderkey, l_linenumber"""),
    (spark, dir) => {
      val key = (col("l_orderkey") * 10 + col("l_linenumber")).cast("string")
      Tables.load(spark, dir, "lineitem")
        .filter(portableBucket(key) < 10)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    })

  /** Stratified deterministic sampling: per-stratum rates (downsample
    * the dominant language, keep the rest) — the shape every
    * training-mix rebalance uses. Same portable hash, so the exact
    * member set is oracle-checked, not just the counts.
    */
  val qSampleStratified: QuerySpec = QuerySpec(
    "q_sample_stratified",
    Some("""SELECT lang, count(*) AS n_sampled,
        CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM (SELECT lang, doc_id FROM documents
        WHERE CAST(('0x' || substr(md5('graft-sample-v1' || '|' ||
          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 <
          CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 60 ELSE 100 END)
      GROUP BY lang ORDER BY lang"""),
    (spark, dir) => {
      val rate = when(col("lang") === "en", 25)
        .when(col("lang") === "de", 60).otherwise(100)
      Tables.load(spark, dir, "documents")
        .filter(portableBucket(col("doc_id").cast("string")) < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), min("doc_id").as("first_doc"))
        .orderBy("lang")
    })

  /** Domain-mixture resampling (the "rebalance the training mix to
    * target shares" shape): per-language keep rates are DERIVED from
    * the corpus — rate = min(100%, uniform-target-share / actual-share)
    * — so over-represented languages are downsampled toward the target
    * and the rest kept whole (downsample-only, the standard approach;
    * upsampling is a repeat factor, a different operator). All rate
    * arithmetic is INTEGER (percent, floor division) so both engines
    * compute identical thresholds, and membership is the same portable
    * md5 bucket as the other samplers — the kept set is a pure function
    * of the data, oracle-checked to the exact member set.
    *
    * Scale: two metadata-sized aggregates (per-language counts, one
    * totals row), a broadcast of #languages rate rows, and a narrow
    * filter — no data shuffle at all beyond the aggregates' partials.
    */
  val qMixResample: QuerySpec = QuerySpec(
    "q_mix_resample",
    Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
      t AS (SELECT count(*) AS nlang, sum(cnt) AS n FROM c),
      r AS (SELECT lang, least(100, (100 * n) // (nlang * cnt)) AS rate
        FROM c, t)
      SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
      WHERE CAST(('0x' || substr(md5('graft-sample-v1' || '|' ||
        CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < rate
      ORDER BY d.doc_id"""),
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents").select("doc_id", "lang")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val totals = counts.agg(count(lit(1)).as("nlang"), sum("cnt").as("n"))
      val rates = counts.crossJoin(broadcast(totals))
        .withColumn("rate",
          least(lit(100L), expr("(100 * n) div (nlang * cnt)")))
        .select("lang", "rate")
      docs.join(broadcast(rates), "lang")
        .filter(portableBucket(col("doc_id").cast("string")) < col("rate"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    })

  /** K-fold assignment for cross-validation: fold = portable hash % k,
    * stable across runs and engines; oracle checks the exact fold of
    * every row via per-fold counts and extremes.
    */
  val qKfold: QuerySpec = QuerySpec(
    "q_kfold",
    Some("""SELECT fold, count(*) AS n, CAST(min(doc_id) AS BIGINT) AS min_doc,
        CAST(max(doc_id) AS BIGINT) AS max_doc
      FROM (SELECT doc_id,
        CAST(CAST(('0x' || substr(md5('graft-sample-v1' || '|' ||
          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS INT) AS fold
        FROM documents)
      GROUP BY fold ORDER BY fold"""),
    (spark, dir) => {
      val fold = (conv(substring(md5(concat_ws("|", lit("graft-sample-v1"),
        col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 5).cast("int")
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), fold.as("fold"))
        .groupBy("fold")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
        .orderBy("fold")
    })

  /** Deterministic WEIGHTED sampling: keep-probability proportional to a
    * per-row quality weight (the training-mix shape: upsample clean
    * text, downsample boilerplate) — still a pure function of the data
    * via the portable hash, so the exact member set is oracle-checked
    * like the uniform variants.
    */
  val qSampleWeighted: QuerySpec = QuerySpec(
    "q_sample_weighted",
    Some("""SELECT lang, count(*) AS n_kept, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM (SELECT lang, doc_id FROM documents
        WHERE CAST(('0x' || substr(md5('graft-sample-v1' || '|' ||
          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 <
          CAST(least(100, ceil(100.0 *
            CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
            / length(text))) AS BIGINT))
      GROUP BY lang ORDER BY lang"""),
    (spark, dir) => {
      // weight = alpha ratio (same quality signal as q_text_quality):
      // keep-rate percentage = ceil(100 * alpha), capped at 100
      val alpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
        length(col("text"))
      val rate = least(lit(100), ceil(lit(100.0) * alpha)).cast("long")
      Tables.load(spark, dir, "documents")
        .filter(portableBucket(col("doc_id").cast("string")) < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), min("doc_id").as("first_doc"))
        .orderBy("lang")
    })

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis,
    * IPL'06): each row gets key u^(1/w) with u uniform in (0,1); the
    * top-k keys ARE a weighted sample without replacement. Deterministic
    * here because u derives from the portable md5 hash, so the EXACT
    * member set is oracle-checked — unlike [[qSampleWeighted]]'s
    * independent keep-probabilities, this draws a fixed-size sample
    * with inclusion probability ∝ weight.
    *
    * Scale shape: pure per-row arithmetic + `TakeOrderedAndProject`
    * top-k — no shuffle beyond the k-row gather. Ordering compares the
    * log form ln(u)/w (monotone in u^(1/w), numerically saner); key
    * gaps across a corpus are ~orders of magnitude above libm's 1-ulp
    * ln noise, so cross-engine order is stable.
    */
  val qSampleEs: QuerySpec = QuerySpec(
    "q_sample_es",
    Some("""SELECT doc_id, n_chars,
        round(ln((CAST(('0x' || substr(md5('graft-es-v1' || '|' ||
            CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0) / n_chars, 9) AS es_key
      FROM documents
      ORDER BY ln((CAST(('0x' || substr(md5('graft-es-v1' || '|' ||
          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
          / 4294967296.0) / n_chars DESC, doc_id
      LIMIT 20"""),
    (spark, dir) => {
      val h = conv(substring(md5(concat_ws("|", lit("graft-es-v1"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
      val es = log((h.cast("double") + 0.5) / 4294967296.0) / col("n_chars")
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"), es.as("es"))
        .orderBy(col("es").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("n_chars"), round(col("es"), 9).as("es_key"))
    })

  /** Temperature-based multilingual mixture weights (the mBERT/XLM
    * exponentiated-share recipe at α = 0.5): w_l ∝ n_l^0.5, normalized.
    * α is FIXED at 0.5 so the power is `sqrt` — correctly rounded per
    * IEEE-754, hence bit-identical cross-engine (a fractional `pow`
    * would be a libm 1-ulp risk). The normalizing total is a RUNNING
    * sum over langs in lexical order (ROWS frame), pinning the FP
    * summation order — a bare SUM's addition order is engine-chosen
    * and could flip the last ulp before the 6 dp round.
    *
    * Scale: one hash agg on lang; everything downstream operates on
    * the |langs|-row summary.
    */
  val qMixtureWeights: QuerySpec = QuerySpec(
    "q_mixture_weights",
    Some("""WITH l AS (SELECT lang, count(*) AS n_docs FROM documents
        GROUP BY lang),
      c AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS sq,
        sum(sqrt(CAST(n_docs AS DOUBLE))) OVER (ORDER BY lang
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM l),
      t AS (SELECT max(cum) AS total FROM c)
      SELECT c.lang, c.n_docs, round(c.sq / t.total, 6) AS weight,
        round(c.sq / t.total * 10000, 2) AS per_10k
      FROM c CROSS JOIN t ORDER BY c.lang"""),
    (spark, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val l = Tables.load(spark, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val c = l.select(col("lang"), col("n_docs"),
          sqrt(col("n_docs").cast("double")).as("sq"))
        .withColumn("cum", sum("sq").over(W.orderBy("lang")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      val t = c.agg(max("cum").as("total"))
      c.crossJoin(broadcast(t))
        .select(col("lang"), col("n_docs"),
          round(col("sq") / col("total"), 6).as("weight"),
          round(col("sq") / col("total") * 10000, 2).as("per_10k"))
        .orderBy("lang")
    })

  /** Deterministic UPSAMPLING by repeat factor — the other half of the
    * mix-rebalance story ([[qMixResample]] is downsample-only and its
    * scaladoc defers exactly here): under-represented strata emit
    * whole-integer copies of every row plus a portable-hash-gated
    * extra copy for the fractional remainder, so the emitted share
    * hits the target in expectation while remaining a PURE FUNCTION of
    * the data (byte-reproducible by any engine — the oracle recomputes
    * per-row copy counts from first principles). Factors are permille
    * integers (floor division) so both engines compute identical
    * thresholds; capped at 10× (a corpus needing more repeat than that
    * needs more data, not more clones). Output carries `rep` ∈
    * [1, copies] so downstream shuffles spread the clones.
    *
    * Scale: two metadata-sized aggregates + a broadcast of #strata
    * factor rows + one generator (`explode(sequence)`) — no data
    * shuffle; output size is the target mix by construction.
    */
  def upsampleRepeat(df: DataFrame, stratumCol: String,
                     key: Column): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(count(lit(1)).as("nlang"), sum("cnt").as("n"))
    val pm = counts.crossJoin(broadcast(totals))
      .withColumn("pm", least(lit(10000L), greatest(lit(1000L),
        expr("(1000 * n) div (nlang * cnt)"))))
      .select(stratumCol, "pm")
    val b1000 = conv(substring(md5(concat_ws("|", lit("graft-sample-v1"),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % 1000
    df.join(broadcast(pm), Seq(stratumCol))
      .withColumn("copies", expr("pm div 1000") +
        when(b1000 < col("pm") % 1000, 1L).otherwise(0L))
      .withColumn("rep", explode(sequence(lit(1L), col("copies"))))
      .drop("pm", "copies")
  }

  /** Per-language emitted-row counts + a copy-weighted checksum after
    * uniform-target upsampling: the checksum (Σ copies·doc_id) pins
    * every row's exact copy count against DuckDB's first-principles
    * recomputation — the repeat factors, the fractional-remainder
    * hash gate, and the explode all hash-checked at once.
    */
  val qMixUpsample: QuerySpec = QuerySpec(
    "q_mix_upsample",
    Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
      t AS (SELECT count(*) AS nlang, sum(cnt) AS n FROM c),
      p AS (SELECT lang, least(10000, greatest(1000,
          (1000 * n) // (nlang * cnt))) AS pm FROM c, t),
      x AS (SELECT d.doc_id, d.lang,
          pm // 1000 + CASE WHEN
            CAST(('0x' || substr(md5('graft-sample-v1' || '|' ||
              CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
            < pm % 1000 THEN 1 ELSE 0 END AS copies
        FROM documents d JOIN p USING (lang))
      SELECT lang, CAST(sum(copies) AS BIGINT) AS n_rows,
        count(*) AS n_docs,
        CAST(sum(copies * doc_id) AS BIGINT) AS checksum
      FROM x GROUP BY lang ORDER BY lang"""),
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents").select("doc_id", "lang")
      upsampleRepeat(docs, "lang", col("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("doc_id").as("n_docs"),
          sum("doc_id").as("checksum"))
        .orderBy("lang")
    })

  def specs: Seq[QuerySpec] =
    Seq(qTrainTestSplit, qSampleHash, qSampleStratified, qSampleWeighted,
        qMixResample, qKfold, qSampleEs, qMixtureWeights, qMixUpsample)
}
