package graft.tools
import graft.GraftSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("smoke", 4)
    println("[entry] rows=" + graft.SparkEntry.entry(s).count())
    s.stop()
  }
}
