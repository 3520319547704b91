package graft.tools

import graft.GraftSession

/** One-off probe: which ANSI surfaces does this Spark build parse/run?
  * (recursive CTE, LATERAL join, UNPIVOT alias forms…)
  */
object SqlFeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("sql-feature-probe", 4)
    def tryq(name: String, sql: String): Unit =
      try {
        val n = spark.sql(sql).count()
        println(s"[probe] $name: OK ($n rows)")
      } catch {
        case e: Exception =>
          println(s"[probe] $name: FAIL ${e.getClass.getSimpleName}: " +
            e.getMessage.take(160).replace('\n', ' '))
      }
    tryq("recursive_cte",
      """WITH RECURSIVE t(n) AS (
           SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5)
         SELECT * FROM t""")
    tryq("lateral_join",
      """SELECT * FROM VALUES (1), (2) AS a(x),
         LATERAL (SELECT x + 1 AS y)""")
    tryq("lateral_correlated",
      """SELECT a.x, b.y FROM VALUES (1), (2) AS a(x)
         JOIN LATERAL (SELECT a.x * 10 AS y) b""")
    graft.sources.Tables.registerAll(spark, "/root/testdata/sf0.001")
    tryq("lateral_limit",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         FROM customer c,
           LATERAL (SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
                    FROM orders WHERE o_custkey = c.c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    tryq("recursive_bfs",
      """WITH RECURSIVE e0 AS (
           SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS t
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0),
         seed AS (SELECT o_custkey AS node FROM orders GROUP BY o_custkey
           ORDER BY count(*) DESC, o_custkey LIMIT 1),
         walk(node, hop) AS (
           SELECT node, 0 FROM seed
           UNION ALL
           SELECT e.t, w.hop + 1 FROM walk w JOIN e ON e.s = w.node
           WHERE w.hop < 3)
         SELECT node, min(hop) AS hop FROM walk GROUP BY node
         ORDER BY node""")
    tryq("recursive_union_distinct",
      """WITH RECURSIVE t(n) AS (
           SELECT 1 UNION SELECT CASE WHEN n >= 3 THEN 1 ELSE n + 1 END FROM t)
         SELECT * FROM t""")
    tryq("recursive_bfs_distinct",
      """WITH RECURSIVE e0 AS (
           SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS t
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0),
         seed AS (SELECT o_custkey AS node FROM orders GROUP BY o_custkey
           ORDER BY count(*) DESC, o_custkey LIMIT 1),
         walk(node, hop) AS (
           SELECT node, 0 FROM seed
           UNION
           SELECT e.t, w.hop + 1 FROM walk w JOIN e ON e.s = w.node
           WHERE w.hop < 3)
         SELECT node, min(hop) AS hop FROM walk GROUP BY node
         ORDER BY node""")
    spark.stop()
  }
}
