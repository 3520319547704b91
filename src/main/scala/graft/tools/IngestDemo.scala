package graft.tools

import graft.GraftSession
import graft.sources.{Ingest, Tables}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Runnable usage example for the Ingest facade: CSV/JSON round-trips,
  * partitioned parquet sink, streaming file source → checkpointed sink.
  * `runMain graft.tools.IngestDemo [sfDir]`.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("ingest-demo")
    val work = Files.createTempDirectory("graft-ingest-demo").toString

    val docs = Tables.load(spark, sf, "documents")
    Ingest.writeCsv(docs, s"$work/docs_csv")
    val csvBack = Ingest.readCsv(spark, s"$work/docs_csv", Tables.documents)
    println(s"[demo] csv round-trip: ${csvBack.count()} rows, " +
      s"diff=${csvBack.exceptAll(docs).count()}")

    val orders = Tables.load(spark, sf, "orders")
    Ingest.writeJson(orders, s"$work/orders_json")
    val jsonBack = Ingest.readJson(spark, s"$work/orders_json", Tables.orders)
    println(s"[demo] json round-trip: ${jsonBack.count()} rows, " +
      s"diff=${jsonBack.exceptAll(orders).count()}")

    Ingest.writeParquet(orders.withColumn("status", col("o_orderstatus")),
      s"$work/orders_part", SaveMode.Overwrite, Seq("status"))
    val pruned = spark.read.parquet(s"$work/orders_part").filter(col("status") === "F")
    val hasPartitionFilter = pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(status")
    println(s"[demo] partitioned sink: pruned=${pruned.count()} rows, " +
      s"partitionFilterInPlan=$hasPartitionFilter")

    // source dir must exist before the streaming reader is defined
    Ingest.writeParquet(docs, s"$work/docs_stream_src")
    val stream = Ingest.readStreamFiles(spark, s"$work/docs_stream_src", Tables.documents)
    val q = Ingest.streamToParquet(stream, s"$work/stream_out", s"$work/stream_ck").start()
    q.processAllAvailable(); q.stop()
    println(s"[demo] streaming sink: " +
      s"${spark.read.schema(Tables.documents).parquet(s"$work/stream_out").count()} rows")
    spark.stop()
  }
}
