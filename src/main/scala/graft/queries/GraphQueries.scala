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

  /** Shared trade-edge derivation (customer nation → supplier nation with
    * order counts) — the same 6-way join pagerank uses, factored so the
    * triangle query provably runs on the identical graph. */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
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
      .select(col("src"), col("dst"))

  private val tradeEdgesSql =
    """SELECT cn.n_name src, sn.n_name dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey""".stripMargin

  /** Triangle ENUMERATION on the undirected STRONG-trade graph — the
    * clustering / community-density primitive (triangle counting is the
    * standard first graph workout beyond PageRank; cf. Suri &
    * Vassilvitskii, WWW'11). The raw nation trade graph is near-complete
    * (every triple closes), so the graph is first sparsified to edges with
    * ABOVE-AVERAGE trade volume — the exact-integer cross-multiplied
    * predicate `w · |E| > Σw` (no float average), which scales with the
    * tier instead of hard-coding a count threshold.
    *
    * Algorithm: orient every undirected edge low→high (`least/greatest` on
    * the node name), aggregate lineitem-level trade events to weights, then
    * enumerate each triangle EXACTLY ONCE as (a<b<c) via two equi-joins:
    * wedges a→b→c closed by the a→c edge. The orientation is what kills
    * the n² wedge blowup at scale — each triangle has exactly one
    * low-endpoint orientation, so no post-hoc dedup of 3! permutations,
    * and a production variant orients by DEGREE (low-degree first) to
    * bound wedge fan-out at power-law hubs; on the 25-node nation graph
    * name order suffices and keeps the oracle trivially mirrorable. Both
    * joins are broadcastable here and shuffle equi-joins at scale — never
    * a cartesian. */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val und = tradeEdges(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
    // scalar totals attach as the repo's standard 1-row broadcast
    // crossJoin (plans as a BroadcastNestedLoopJoin with a single-row
    // build side — constant work per probe row, not a pair blowup)
    val tot = und.agg(sum("w").cast("long").as("sw"),
      count(lit(1)).as("ne"))
    val strong = und.crossJoin(broadcast(tot))
      .filter(col("w") * col("ne") > col("sw"))
      .select("u", "v")
    val e1 = strong.select(col("u").as("a"), col("v").as("b"))
    val e2 = strong.select(col("u").as("b2"), col("v").as("c2"))
    val e3 = strong.select(col("u").as("a3"), col("v").as("c3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
      .select(col("a"), col("b"), col("c2").as("c"))
      .orderBy("a", "b", "c")
  }

  val trianglesSql: String =
    s"""WITH te AS ($tradeEdgesSql),
       |und AS (SELECT least(src, dst) u, greatest(src, dst) v, count(*)::BIGINT w
       |        FROM te WHERE src <> dst GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) sw, count(*)::BIGINT ne FROM und),
       |strong AS (SELECT u, v FROM und, tot WHERE w * ne > sw)
       |SELECT e1.u a, e1.v b, e2.v c
       |FROM strong e1
       |JOIN strong e2 ON e1.v = e2.u
       |JOIN strong e3 ON e3.u = e1.u AND e3.v = e2.v
       |ORDER BY a, b, c""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "graph_pagerank" -> (pagerank _),
    "graph_triangles" -> (triangles _),
  )

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
    "graph_triangles" -> trianglesSql,
  )
}
