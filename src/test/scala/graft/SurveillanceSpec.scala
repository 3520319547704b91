package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Epi, Hl7}

/** The surveillance-domain operators: HL7 v2 escape codec on
  * adversarial literals (the cases the fixture round trip cannot
  * force), segment parsing degrade rules, and MMWR week pins on
  * published calendar facts.
  */
class SurveillanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def roundtrip(vals: Seq[String]): Seq[String] = {
    import spark.implicits._
    vals.toDF("v")
      .select(Hl7.hl7Unescape(Hl7.hl7Escape(col("v"))).as("r"))
      .collect().map(_.getString(0)).toSeq
  }

  test("HL7 escape/unescape round-trips every adversarial literal") {
    val cases = Seq(
      "plain text",
      "|", "^", "~", "&", "\\",
      "\\|", "|\\", "\\\\", "a|b^c~d&e\\f",
      "\\F\\", // literal text that LOOKS like an escape sequence
      "\\E\\F\\", "||||", "^~\\&", "",
      // control characters: a raw CR in a payload IS the segment
      // separator — the codec must hex-escape it, not pass it through
      "\r", "\n", "a\rb\nc", "\r\n", "\\X0D\\", "\\r")
    assert(roundtrip(cases) === cases)
  }

  test("a CR-bearing payload cannot re-frame the message") {
    import spark.implicits._
    // before the \X0D\ escape, the rendered message would contain a
    // raw CR inside OBX-5 and split into a phantom segment; the parse
    // must instead recover the payload byte-for-byte
    val docs = Seq((7L, "evil\rPID|99|payload", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val parsed = Hl7.parseMessages(Hl7.renderMessages(docs, 17)).head()
    assert(parsed.getLong(0) === 7L)
    assert(parsed.getString(1) === "7")
    assert(parsed.getString(2) === "evil\rPID|99|payload|en^web~\\&")
    // framing intact: exactly three segments, none of them phantom
    val segs = Hl7.renderMessages(docs, 17).select(col("hl7")).head()
      .getString(0).split("\r")
    assert(segs.length === 3 &&
      segs.map(_.takeWhile(_ != '|')).toSeq === Seq("MSH", "PID", "OBX"))
  }

  test("unescape passes unknown custom escapes through visibly") {
    import spark.implicits._
    val out = Seq("a\\Zxx\\b").toDF("v")
      .select(Hl7.hl7Unescape(col("v"))).head().getString(0)
    assert(out === "a\\Zxx\\b")
  }

  test("parse degrades on malformed messages: absent segments yield NULLs") {
    import spark.implicits._
    val msgs = Seq(
      ("MSH|^~\\&|A|B|C|D|||ORU^R01|42|P|2.5.1\rPID|1||42^^^X", "no OBX"),
      ("garbage with no segments at all", "nothing"),
      ("OBX|1|TX|T||v\\F\\w||||||F", "OBX only")).toDF("hl7", "label")
    val p = Hl7.parseMessages(msgs).collect()
    // no OBX: header parsed, payload NULL
    assert(p(0).getLong(0) === 42L && p(0).getString(1) === "42")
    assert(p(0).isNullAt(2) && !p(0).getBoolean(4))
    // nothing: all NULL, no throw
    assert(p(1).isNullAt(0) && p(1).isNullAt(1) && p(1).isNullAt(2))
    // OBX only: payload parsed (escape decoded), header NULL
    assert(p(2).isNullAt(0) && p(2).getString(2) === "v|w" &&
      p(2).getBoolean(4))
  }

  test("MMWR weeks match published calendar facts at year boundaries") {
    import spark.implicits._
    // public MMWR calendar pins: MMWR 2014 had 53 weeks — the week
    // Dec 28 2014–Jan 3 2015 holds only THREE January days, so it is
    // 2014's week 53, and 2015's week 1 starts Jan 4 2015; MMWR 2015
    // therefore ends with week 52 (Dec 27 2015–Jan 2 2016) and week 1
    // of 2016 starts Sunday Jan 3 2016; Jan 1 2022 (a Saturday) closes
    // 2021's week 52.
    val pins = Seq(
      ("2016-01-02", 2015, 52),
      ("2016-01-03", 2016, 1),
      ("2014-12-28", 2014, 53),
      ("2015-01-04", 2015, 1),
      ("2022-01-01", 2021, 52),
      ("2026-08-16", 2026, 33))
    val got = pins.map(_._1).toDF("d")
      .select(col("d"), Epi.mmwrYear(col("d")).as("y"),
        Epi.mmwrWeek(col("d")).as("w"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got === pins.map(p => (p._1, p._2, p._3)))
  }

  test("EARS C2 alerts exactly on a spike over a noisy baseline, never inside the guard band") {
    import spark.implicits._
    // alternating 1/2 baseline (sd > 0 everywhere) with one 40-case
    // spike: the spike day must alert; the two days AFTER it must NOT
    // have it in their baselines yet (2-day guard), and by day+3 the
    // spike inflates sd enough that normal counts never alert
    val days = (0 until 60).map { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i.toLong))
      val n = if (i == 30) 40 else 1 + (i % 2)
      (d, n)
    }
    val df = days.flatMap { case (d, n) => Seq.fill(n)(("A", d)) }
      .toDF("o_orderpriority", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    // drive the same fold the row runs, via a temp fixture dir
    val dir = java.nio.file.Files.createTempDirectory("graft-ears").toString
    df.select(lit(1L).as("o_orderkey"), lit(1L).as("o_custkey"),
      lit("O").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val alerts = Epi.qEarsAlerts.run(spark, dir)
      .collect().map(r => (r.getDate(1).toString, r.getLong(2))).toSeq
    assert(alerts.map(_._1).contains("2020-01-31"), alerts.toString) // the spike
    assert(alerts.forall(_._1 == "2020-01-31"), alerts.toString) // and only it
  }

  test("every date lands in exactly one MMWR week of 1..53 and weeks are 7 days") {
    import spark.implicits._
    val days = spark.sql(
      "SELECT explode(sequence(DATE '2013-12-20', DATE '2017-01-15')) AS d")
    val weeks = days.select(Epi.mmwrYear(col("d")).as("y"),
      Epi.mmwrWeek(col("d")).as("w"))
    assert(weeks.filter(col("w") < 1 || col("w") > 53).count() === 0)
    // each (year, week) bucket holds exactly 7 consecutive days
    // (boundary weeks of the probed range excluded)
    val sizes = weeks.groupBy("y", "w").count()
      .filter(col("y") >= 2014 && col("y") <= 2016)
    assert(sizes.filter(col("count") =!= 7).count() === 0)
  }

  test("Farrington's trend baseline reads growth as normal; C2 cannot") {
    import spark.implicits._
    // a steadily growing catchment: counts rise 2/day for 120 days
    // with a small deterministic sawtooth (so the fit has residual
    // variance) and one true outbreak spike at day 100
    val dense = (0 until 120).map { t =>
      val base = 10.0 + 2.0 * t + (t % 3)
      ("s", java.sql.Date.valueOf(java.time.LocalDate
        .of(2020, 1, 1).plusDays(t.toLong)), t.toDouble,
        if (t == 100) base + 60 else base)
    }.toDF("prio", "day", "t", "y")

    // a mean-baseline detector reads PREDICTABLE growth as perpetual
    // elevation: the C2 statistic sits near its alarm line on every
    // ordinary ramp day (the trend IS the deviation it measures)
    val c2 = Epi.earsC2Score(dense.withColumn("n", col("y")))
      .filter(col("sigma") > 0 && col("day") =!= lit("2020-04-10"))
    assert(c2.filter(col("c2r") >= 2).count() > 50,
      "C2 should read most ramp days as elevated")

    // the regression fits the ramp: ordinary days score ~0, and the
    // ONLY alert is the real spike
    val fa = Epi.farringtonScore(dense).filter(col("sd") > 0)
    val alerts = fa.filter(col("zr") >= 2)
      .select("day").collect().map(_.getDate(0).toString).toSeq
    assert(alerts === Seq("2020-04-10"), // day 100
      s"Farrington should flag exactly the spike, got $alerts")
    val quiet = fa.filter(col("day") =!= lit("2020-04-10"))
      .agg(max(abs(col("zr")))).head().getDouble(0)
    assert(quiet < 2.0, s"ordinary ramp days should score under 2: $quiet")
  }

  test("nowcast corrects recent days by the mature lag distribution") {
    import spark.implicits._
    // mature history (any day ≤ asOf-3): lag histogram {0→2, 1→1, 2→1}
    // over 4 reports ⇒ F(0)=0.5, F(1)=0.75, F(2)=1.0
    val mature = Seq(
      ("2020-01-01", 0), ("2020-01-01", 0), ("2020-01-02", 1),
      ("2020-01-03", 2))
    // recent days at as-of 2020-02-01 (maxLag 3): available lag =
    // asOf - day; observed counts chosen so corrections are exact
    val recent = Seq(
      ("2020-02-01", 0), ("2020-02-01", 0), ("2020-02-01", 0), // lag 0: 3/0.5 = 6
      ("2020-01-31", 0), ("2020-01-31", 1), ("2020-01-31", 0), // lag 1: 3/0.75 = 4
      ("2020-01-30", 2), ("2020-01-30", 0))                    // lag 2: 2/1.0 = 2
    val lineList = (mature ++ recent)
      .toDF("d", "lag").select(to_date(col("d")).as("day"), col("lag"))
    val got = Epi.nowcast(lineList, "2020-02-01", maxLag = 3)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("2020-01-30", 2L, 1.0, 2.0),
      ("2020-01-31", 3L, 0.75, 4.0),
      ("2020-02-01", 3L, 0.5, 6.0)))

    // a lag NO mature report ever had (F = 0) yields NULL, not ∞:
    // shift the mature histogram so lag 0 is empty
    val lineList2 = (Seq(("2020-01-01", 1), ("2020-01-02", 2)) ++
      Seq(("2020-02-01", 0), ("2020-02-01", 0)))
      .toDF("d", "lag").select(to_date(col("d")).as("day"), col("lag"))
    val r2 = Epi.nowcast(lineList2, "2020-02-01", maxLag = 3)
      .filter(col("day") === lit("2020-02-01")).head()
    assert(r2.getLong(1) === 2L)
    assert(r2.getDouble(2) === 0.0)
    assert(r2.isNullAt(3), "F=0 must yield NULL, not a division blow-up")
  }

  /** A minimal orders/customer/nation fixture: `nZones` zones, one
    * customer per zone, `weeks` Sunday-aligned weeks with `perWeek`
    * cases per (zone, week), plus `extra` injected cases at the given
    * (zone, week-index) cells.
    */
  private def scanFixture(nZones: Int, weeks: Int, perWeek: Int,
      extra: Seq[(Int, Int, Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scan").toString
    // 2020-01-05 is a Sunday: week w spans day 7w .. 7w+6
    val d0 = java.time.LocalDate.of(2020, 1, 5)
    val base = for {
      z <- 0 until nZones; w <- 0 until weeks; i <- 0 until perWeek
    } yield (z, w, i % 7)
    val inj = extra.flatMap { case (z, w, k) =>
      (0 until k).map(i => (z, w, i % 7)) }
    (base ++ inj).zipWithIndex.map { case ((z, w, dow), i) =>
      (i.toLong, z.toLong + 1,
        java.sql.Timestamp.valueOf(
          d0.plusDays(7L * w + dow).atStartOfDay),
        "1-URGENT", "O", 1.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate",
        "o_orderpriority", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (0 until nZones).map(z =>
        (z.toLong + 1, s"Customer#$z", z, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    (0 until nZones).map(z => (z, s"ZONE_$z", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    dir
  }

  test("space-time scan's top cluster is the injected outbreak cylinder") {
    // 4 zones x 20 uniform weeks; zone 2 gets +40 cases in weeks 10-11
    val dir = scanFixture(4, 20, 5,
      Seq((2, 10, 20), (2, 11, 20)))
    val top = Epi.qSpacetimeScan.run(spark, dir).head()
    assert(top.getString(0) === "ZONE_2", top.toString)
    assert(top.getDate(1).toString === "2020-03-15", top.toString) // week 10
    assert(top.getInt(2) === 2, top.toString) // the 2-week cylinder wins
    assert(top.getLong(3) === 50L, top.toString) // 2x(5+20) observed
  }

  test("space-time scan scores nothing on a uniform surface") {
    // perfectly uniform counts: every cylinder's observed equals its
    // expectation EXACTLY, so the integer c*N > zn*iw membership
    // excludes every candidate — no fake clusters from float slack
    val dir = scanFixture(3, 12, 4, Nil)
    assert(Epi.qSpacetimeScan.run(spark, dir).count() === 0)
  }

  test("CUSUM accumulates a sustained small shift that C2 never flags") {
    import spark.implicits._
    // 120 days cycling [2,3,4,5], then 60 days shifted +2: the
    // biggest single-day excursion stays under 2 sigma of the
    // whole-period spread (C2's 3-sigma line never trips), but the
    // sustained shift accumulates straight through CUSUM's h=4
    val days = (0 until 180).map { t =>
      val n = (if (t < 120) 2 else 4) + (t % 4)
      (java.sql.Date.valueOf(
        java.time.LocalDate.of(2020, 1, 1).plusDays(t.toLong)), n)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum").toString
    days.flatMap { case (d, n) => Seq.fill(n)((d, "A")) }
      .toDF("o_orderdate", "o_orderpriority")
      .select(lit(1L).as("o_orderkey"), lit(1L).as("o_custkey"),
        lit("O").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val cusum = Epi.qCusumAlerts.run(spark, dir)
      .collect().map(_.getDate(1).toString).toSeq
    assert(cusum.nonEmpty, "the sustained shift must alert")
    // every alert sits INSIDE the shifted regime, none before it
    assert(cusum.forall(_ >= "2020-04-30"), cusum.take(5).toString)
    val c2 = Epi.qEarsAlerts.run(spark, dir).count()
    assert(c2 === 0, "no single day reaches C2's 3-sigma line")
  }

  test("MLLP wire survives the round trip and degrades visibly on corruption") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha text", "en", "web"), (2L, "beta text", "fr", "api"),
      (17L, "gamma", "de", "feed"), // renders without OBX — still frames
      (33L, "delta | with ^ delims", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val wire = Hl7.mllpWire(Hl7.renderMessages(docs), pmod(col("doc_id"),
      lit(2L)))
    val ok = Hl7.mllpVerify(wire).orderBy("batch_id").collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3), r.getBoolean(4), r.getLong(5))).toSeq === Seq(
      (0L, 1L, 1L, true, true, 2L),
      (1L, 3L, 3L, true, true, 51L)))
    // corruption 1: a frame missing its VT start byte
    val noVt = wire.withColumn("wire",
      regexp_replace(col("wire"), "\u000bBTS", "BTS"))
    assert(Hl7.mllpVerify(noVt).filter(col("frames_ok")).count() === 0)
    // corruption 2: a tampered trailer count — frames fine, BTS not
    val badBts = wire.withColumn("wire",
      regexp_replace(col("wire"), "BTS\\|", "BTS|9"))
    val bad = Hl7.mllpVerify(badBts).collect()
    assert(bad.forall(_.getBoolean(3)), "framing itself is intact")
    assert(bad.forall(!_.getBoolean(4)), "the count mismatch must surface")
  }
}
