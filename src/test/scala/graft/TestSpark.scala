package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark sessions are heavy;
  * suites share via getOrCreate on identical config).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", 4)
  val sf: String = "/root/testdata/sf0.001"
}
