package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar UDF escape hatch (SURVEY.md §2.10): supported, registered for
  * both DSL and SQL entry — and checked against the codegen'd built-in
  * composition that should be preferred (the UDF breaks whole-stage
  * codegen; the built-in form doesn't).
  */
class UdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("scalar udf matches the preferred built-in composition") {
    val slugifyUdf = udf((s: String) =>
      if (s == null) null else s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    spark.udf.register("slugify", slugifyUdf)

    val docs = Tables.load(spark, sf, "documents").limit(100)
    val viaUdf = docs.select(col("doc_id"), slugifyUdf(col("text")).as("slug"))
    val viaBuiltin = docs.select(col("doc_id"),
      regexp_replace(lower(col("text")), "[^a-z0-9]+", "-").as("slug"))
    assert(viaUdf.exceptAll(viaBuiltin).count() === 0)
    assert(viaBuiltin.exceptAll(viaUdf).count() === 0)

    // SQL entry
    docs.createOrReplaceTempView("udf_docs")
    val n = spark.sql(
      "SELECT count(*) FROM udf_docs WHERE slugify(lang) = lang").collect().head.getLong(0)
    assert(n === 100) // langs are already lowercase alphanumeric
  }
}
