package graft.operators

import graft.QuerySpec
import graft.functions.GraftFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text scrubbing for training-data curation (north-star pipeline):
  * PII redaction, URL parsing + domain blocklists, and canonical text
  * folding — the cleanup passes that run over every document BEFORE
  * dedup/quality/packing, so they must be narrow per-row projections
  * (zero shuffle, whole-stage codegen) to survive 100 TB.
  *
  * The synthetic `documents` fixture contains no PII/URLs/accents, so
  * each query first DERIVES a messy column from fixture data with
  * engine-portable arithmetic (concat/translate of doc_id/source/lang
  * — the `doc_id % 50` benchmark-slice trick from
  * [[Contamination]]), then scrubs it; the DuckDB oracle performs the
  * identical derivation and scrub, so the transform itself is
  * hash-checked end-to-end, not just "ran without error".
  */
object Scrub {

  // ---------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------

  /** Redact emails, US-style short phone numbers, and dotted-quad IPs.
    * Patterns use the RE2-compatible subset (no backrefs/lookaround,
    * no \b — Java and DuckDB agree on these), applied email → IP →
    * phone so the dotted quad is consumed before the phone pattern
    * could see digit-hyphen runs.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text, "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email, "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>")
    regexp_replace(ip, "\\d{3}-\\d{4}", "<PHONE>")
  }

  /** doc_id-derived messy text: the fixture text plus one email, one
    * phone, one IP — the oracle builds the identical string.
    */
  private def rawPii: Column = concat(
    col("text"),
    lit(" contact user"), col("doc_id"), lit("@example.com ph 555-"),
    lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
    lit(" from 10."), pmod(col("doc_id"), lit(256)),
    lit("."), pmod(col("doc_id") / 7, lit(256)).cast("long"),
    lit(".9"))

  val qPiiRedact: QuerySpec = QuerySpec(
    "q_pii_redact",
    Some("""WITH raw AS (SELECT doc_id,
        text || ' contact user' || doc_id || '@example.com ph 555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
          ' from 10.' || (doc_id % 256) || '.' ||
          CAST(trunc(doc_id / 7) AS BIGINT) % 256 || '.9' AS t
        FROM documents)
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(t,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
          '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g'),
          '\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
      FROM raw ORDER BY doc_id"""),
    (spark, dir) =>
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), redactPii(rawPii).as("redacted"))
        .orderBy("doc_id"))

  // ---------------------------------------------------------------
  // URL parsing + domain blocklist
  // ---------------------------------------------------------------

  /** URL decomposition via Spark's codegen'd `parse_url` plus a
    * blocklist verdict. The blocklist is a tiny in-plan literal set —
    * in production it is a broadcast dimension table joined on
    * `host`; either way nothing corpus-sized shuffles.
    */
  def urlParts(url: Column, blockedHosts: Seq[String]): Seq[(String, Column)] = Seq(
    "host" -> parse_url(url, lit("HOST")),
    "path" -> parse_url(url, lit("PATH")),
    "query" -> parse_url(url, lit("QUERY")),
    "blocked" -> parse_url(url, lit("HOST")).isin(blockedHosts: _*))

  val qUrlExtract: QuerySpec = QuerySpec(
    "q_url_extract",
    Some("""WITH raw AS (SELECT doc_id,
        'https://' || source || '.example.com/p/' || doc_id || '?ref=' || lang AS url
        FROM documents)
      SELECT doc_id,
        regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
        regexp_extract(url, 'https?://[^/?#]+(/[^?#]*)', 1) AS path,
        regexp_extract(url, '\?([^#]*)', 1) AS query,
        regexp_extract(url, 'https?://([^/?#]+)', 1)
          IN ('src0.example.com', 'src3.example.com') AS blocked
      FROM raw ORDER BY doc_id"""),
    (spark, dir) => {
      val url = concat(lit("https://"), col("source"), lit(".example.com/p/"),
        col("doc_id"), lit("?ref="), col("lang"))
      val parts = urlParts(col("url"),
        Seq("src0.example.com", "src3.example.com"))
      Tables.load(spark, dir, "documents")
        .withColumn("url", url)
        .select(col("doc_id") +: parts.map { case (n, c) => c.as(n) }: _*)
        .orderBy("doc_id")
    })

  // ---------------------------------------------------------------
  // Canonical text fold
  // ---------------------------------------------------------------

  val qTextFold: QuerySpec = QuerySpec(
    "q_text_fold",
    Some("""WITH messy AS (SELECT doc_id,
        translate(CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END,
          'aeo', 'àéö') AS m, text
        FROM documents)
      SELECT doc_id,
        trim(regexp_replace(lower(strip_accents(nfc_normalize(m))),
          '\s+', ' ', 'g')) AS folded,
        trim(regexp_replace(lower(strip_accents(nfc_normalize(m))),
          '\s+', ' ', 'g')) = trim(regexp_replace(text, '\s+', ' ', 'g'))
          AS fold_roundtrip
      FROM messy ORDER BY doc_id"""),
    (spark, dir) => {
      // even docs get uppercased (accent-free: translate is
      // case-sensitive), odd docs get precomposed accents — the fold
      // must undo both back to the canonical fixture text, and the
      // fold_roundtrip column carries that contract through the hash
      val messy = translate(
        when(col("doc_id") % 2 === 0, upper(col("text"))).otherwise(col("text")),
        "aeo", "àéö")
      Tables.load(spark, dir, "documents")
        .withColumn("folded", GraftFunctions.foldText(messy))
        .select(col("doc_id"), col("folded"),
          (col("folded") ===
            trim(regexp_replace(col("text"), "\\s+", " "))).as("fold_roundtrip"))
        .orderBy("doc_id")
    })

  def specs: Seq[QuerySpec] = Seq(qPiiRedact, qUrlExtract, qTextFold)
}
