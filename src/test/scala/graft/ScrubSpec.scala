package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{FoldTextAlgo, GraftFunctions}
import graft.operators.Scrub

/** Text scrubbing (Scrub): fold semantics at the algorithm level,
  * codegen/interpreted parity, redaction behavior on hand-built rows,
  * and the zero-shuffle plan shape the 100 TB posture depends on.
  */
class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def fold(s: String): String =
    FoldTextAlgo.fold(UTF8String.fromString(s)).toString

  test("fold: accents, case, whitespace, combining marks") {
    assert(fold("Café  du   Monde") === "cafe du monde") // precomposed é
    assert(fold("Café du Monde") === "cafe du monde") // e + combining acute
    assert(fold("  \tÄpfel\nund\r\nBirnen  ") === "apfel und birnen")
    assert(fold("") === "")
    assert(fold("   ") === "")
    assert(fold("ÀÉÖÑ") === "aeon")
    assert(fold("already folded text") === "already folded text")
  }

  test("fold: interpreted eval matches codegen result") {
    // one row through a real plan (codegen) vs the algo call directly
    val df = spark.range(1).select(
      GraftFunctions.foldText(lit("Café  DU  Monde")).as("f"))
    assert(df.head.getString(0) === fold("Café  DU  Monde"))
    // null in, null out
    val n = spark.range(1).select(
      GraftFunctions.foldText(lit(null).cast("string")).as("f"))
    assert(n.head.isNullAt(0))
  }

  test("fold is idempotent") {
    val samples = Seq("Café  du Monde", "ÀÉÖ  x", "plain", " á ")
    samples.foreach(s => assert(fold(fold(s)) === fold(s)))
  }

  test("pii redaction scrubs emails, ips, phones and nothing else") {
    import spark.implicits._
    val rows = Seq(
      "write bob.smith+x@corp-mail.co.uk today",
      "server 192.168.001.1 port 80",
      "call 555-0192 now",
      "clean text stays clean",
      "v1.2.3.4 is a version AND an ip shape").toDF("t")
    val out = rows.select(Scrub.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) === "write <EMAIL> today")
    assert(out(1) === "server <IP> port 80")
    assert(out(2) === "call <PHONE> now")
    assert(out(3) === "clean text stays clean")
    // dotted quads are consumed as IPs even in version-like strings —
    // redaction is deliberately recall-biased for PII
    assert(out(4) === "v<IP> is a version AND an ip shape")
  }

  test("scrub queries are narrow: no exchange except the final sort") {
    Seq(Scrub.qPiiRedact, Scrub.qUrlExtract, Scrub.qTextFold).foreach { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"${q.name}: expected only the ORDER BY exchange:\n$plan")
    }
  }
}
