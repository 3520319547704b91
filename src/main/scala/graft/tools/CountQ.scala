package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.allSpecs
    println(s"total=${qs.size} oracle=${qs.count(_.oracle.nonEmpty)} rowsOnly=${qs.count(_.oracle.isEmpty)}")
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    println(s"dups=${dup.mkString(",")}")
  }
}
