package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Iterative graph analytics over relational data — PageRank on the
  * customer-nation → supplier-nation trade graph (who is central in the
  * supply network). Complements the connected-components family
  * (ops/DupGroups) as the second classic O(iters)-round graph operator.
  *
  * Cross-engine exactness: ranks are ppb integers with floor division at
  * every step (ops/PageRank doc) — the DuckDB oracle unrolls the same 10
  * rounds as CTEs and hash-matches bit-for-bit. */
object GraphQueries {

  private val Iters = 10
  private val DampPct = 85L

  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_name").as("src"))),
        col("c_nationkey") === col("cnk"))
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("dst"))),
        col("s_nationkey") === col("snk"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    graft.ops.PageRank.run(edges, Iters, DampPct)
      .orderBy(col("rnk").desc, col("node"))
  }

  val pagerankSql: String = {
    val base = 1000000000L * (100L - DampPct) / 100L
    val pre =
      """WITH e AS (
        |  SELECT cn.n_name src, sn.n_name dst, count(*)::BIGINT w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  GROUP BY 1, 2),
        |outw AS (SELECT src, CAST(sum(w) AS BIGINT) W FROM e GROUP BY 1),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, 1000000000::BIGINT rnk FROM nodes)""".stripMargin
    val rounds = (1 to Iters).map { i =>
      s""",
         |r$i AS (SELECT n.node,
         |  $base + coalesce(CAST(sum(
         |    (((r.rnk * $DampPct) // 100) // o.W) * e.w
         |    + ((((r.rnk * $DampPct) // 100) % o.W) * e.w) // o.W) AS BIGINT), 0) rnk
         |  FROM nodes n
         |  LEFT JOIN e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  LEFT JOIN outw o ON o.src = e.src
         |  GROUP BY 1)""".stripMargin
    }.mkString
    pre + rounds + s"\nSELECT node, rnk FROM r$Iters ORDER BY rnk DESC, node"
  }

  val queries: Map[String, QueryFn] = Map(
    "graph_pagerank" -> (pagerank _),
  )

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
  )
}
