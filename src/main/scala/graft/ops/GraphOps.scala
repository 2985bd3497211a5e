package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over relations — link-authority scoring of the kind
  * a crawl/training-data pipeline uses to weight sources (PageRank on
  * the link graph is the classic crawl-frontier quality prior). The
  * reference reaches graphs only as self-joined tables through
  * `--query` passthrough (/root/reference/main.go:106); here the power
  * iteration is a first-class distributed operator.
  *
  * Determinism: scores are kept in exact integer ppm (1.0 ≡ 1 000 000)
  * and every division is a truncating integer division of non-negative
  * operands (Spark `div` ≡ DuckDB `//` there). The per-iteration update
  *   r'(v) = 150000 + (850 · Σ_{u→v} (r(u) div deg(u))) div 1000
  * is therefore a pure function over BIGINTs — bit-identical in any
  * engine and under any aggregation order, unlike float PageRank where
  * 3 iterations of reordered double sums would drift. (The truncation
  * deliberately sheds ≤ deg(u) ppm of mass per node per step — a
  * well-defined deterministic operator approximating PageRank, the same
  * exactness-over-floats trade every sketch in this repo makes.)
  *
  * Scale posture: edges carry their out-degree (joined once, then the
  * relation is checkpointed and hash-partitioned by source node), so a
  * superstep is ONE join of the score relation (already hash-partitioned
  * by node from the previous superstep's aggregate) against the
  * stationary edge relation plus one dst-keyed partial-aggregable sum —
  * no driver-side state, no growing lineage (per-superstep checkpoint,
  * same discipline as functions/Components). Iteration count is a fixed
  * small constant — the "3 supersteps of a link-quality prior" shape,
  * not convergence-to-epsilon.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed-point integer PageRank over a directed edge list (u, v).
    * Every node must have out-degree ≥ 1 (feed an undirected graph —
    * both edge directions — to guarantee it; dangling-node mass
    * redistribution is deliberately out of scope of this operator).
    */
  def integerPagerank(edges: DataFrame, iters: Int,
                      reliable: Boolean = false): DataFrame = {
    def ck(df: DataFrame, eager: Boolean): DataFrame =
      if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // stationary per-superstep probe side: (u, v, deg(u)), partitioned
    // by u so only the score side moves in later supersteps
    val ed = ck(edges.join(deg, "u").repartition(col("u")), eager = true)
    var r = deg.select(col("u").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      r = ck(
        ed.join(r, ed("u") === r("node"))
          .select(col("v"), expr("r div d").as("contrib"))
          .groupBy(col("v"))
          .agg(sum(col("contrib")).as("s"))
          .select(col("v").as("node"),
            expr("CAST(150000 + (850 * s) div 1000 AS BIGINT)").as("r")),
        eager = false)
    }
    r
  }

  /** Bounded-hop single-source-set shortest paths (Bellman-Ford
    * supersteps on the min-plus semiring): dist' (v) = min(dist(v),
    * min over edges u→v of dist(u) + w(u,v)), iterated `hops` times
    * from a seed relation (node, d). Integer weights keep every
    * distance exact — min-plus needs no division at all, so unlike
    * [[integerPagerank]] there is not even truncation shedding. Each
    * superstep is one join of the frontier-bearing dist relation
    * against the stationary edge relation plus one node-keyed min
    * partial agg; unreached nodes simply never enter the relation
    * (no ∞ sentinels to carry).
    */
  def shortestPaths(edges: DataFrame, seeds: DataFrame, hops: Int,
                    reliable: Boolean = false): DataFrame = {
    def ck(df: DataFrame, eager: Boolean): DataFrame =
      if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
    val ed = ck(edges.repartition(col("u")), eager = true)
    var dist = seeds.select(col("node"), col("d"))
    for (_ <- 1 to hops) {
      dist = ck(
        dist.unionByName(
          ed.join(dist, ed("u") === dist("node"))
            .select(col("v").as("node"), (col("d") + col("w")).as("d")))
          .groupBy(col("node")).agg(min(col("d")).as("d")),
        eager = false)
    }
    dist
  }

  val queries: Map[String, Q] = Map(
    // Authority scores on the undirected bipartite customer↔supplier
    // trade graph (distinct trading pairs via orders ⋈ lineitem).
    // Node ids: customers = 2·custkey, suppliers = 2·suppkey + 1.
    // Isolated nodes (no trades) have no defined score, by construction.
    "q163_pagerank" -> ((s, d) => {
      val co = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(T.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("cu"), (col("l_suppkey") * 2 + 1).as("sv"))
        .distinct()
      val edges = co.select(col("cu").as("u"), col("sv").as("v"))
        .union(co.select(col("sv").as("u"), col("cu").as("v")))
      integerPagerank(edges, 3).orderBy(col("node"))
    }),

    // 4-hop shortest paths from the sub-10 customers over the weighted
    // trade graph: edge cost = 1e6 div (trades on the edge), so heavily
    // traded links are "close" — the supply-chain-proximity query.
    // Node encoding as in q163.
    "q177_shortest_paths" -> ((s, d) => {
      val co = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(T.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("cu"), (col("l_suppkey") * 2 + 1).as("sv"))
        .agg(count(lit(1)).as("n"))
        .withColumn("w", expr("1000000 div n"))
      val edges = co.select(col("cu").as("u"), col("sv").as("v"), col("w"))
        .unionByName(co.select(col("sv").as("u"), col("cu").as("v"), col("w")))
      val seeds = T.customer(s, d).filter(col("c_custkey") < 10)
        .select((col("c_custkey") * 2).as("node"), lit(0L).as("d"))
      shortestPaths(edges, seeds, 4).orderBy(col("node"))
    }),

    // TextRank-style keyword scoring: q163's power iteration run over
    // the word-adjacency graph of the corpus (consecutive-token pairs,
    // both directions) — graph and text families composing, which is
    // the point of operators as library functions. Top 20 keywords by
    // authority; deterministic (cos-free integer ranks, (r, word)
    // tiebreak), so the LIMIT is a TakeOrderedAndProject.
    "q178_textrank_keywords" -> ((s, d) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val toks = T.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "wd")))
      val adj = toks
        .withColumn("nx", lead(col("wd"), 1).over(w))
        .filter(col("nx").isNotNull)
        .select(col("wd").as("a"), col("nx").as("b"))
        .distinct()
      val edges = adj.select(col("a").as("u"), col("b").as("v"))
        .unionByName(adj.select(col("b").as("u"), col("a").as("v")))
        .distinct()
      integerPagerank(edges, 3)
        .orderBy(col("r").desc, col("node"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    "q163_pagerank" ->
      """WITH co AS (
        |  SELECT DISTINCT o_custkey * 2 AS cu, l_suppkey * 2 + 1 AS sv
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), edges AS (
        |  SELECT cu AS u, sv AS v FROM co
        |  UNION ALL
        |  SELECT sv AS u, cu AS v FROM co
        |), deg AS (
        |  SELECT u, count(*) AS d FROM edges GROUP BY 1
        |), ed AS (
        |  SELECT e.u, e.v, d.d FROM edges e JOIN deg d USING (u)
        |), r0 AS (
        |  SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM deg
        |), i1 AS (
        |  SELECT v AS node, CAST(150000 + (850 * sum(r // d)) // 1000 AS BIGINT) AS r
        |  FROM ed JOIN r0 ON ed.u = r0.node GROUP BY v
        |), i2 AS (
        |  SELECT v AS node, CAST(150000 + (850 * sum(r // d)) // 1000 AS BIGINT) AS r
        |  FROM ed JOIN i1 ON ed.u = i1.node GROUP BY v
        |), i3 AS (
        |  SELECT v AS node, CAST(150000 + (850 * sum(r // d)) // 1000 AS BIGINT) AS r
        |  FROM ed JOIN i2 ON ed.u = i2.node GROUP BY v
        |)
        |SELECT node, r FROM i3 ORDER BY node""".stripMargin,

    "q177_shortest_paths" ->
      """WITH co AS (
        |  SELECT o_custkey * 2 AS cu, l_suppkey * 2 + 1 AS sv, count(*) AS n
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), cw AS (SELECT cu, sv, 1000000 // n AS w FROM co),
        |e AS (
        |  SELECT cu AS u, sv AS v, w FROM cw
        |  UNION ALL
        |  SELECT sv AS u, cu AS v, w FROM cw
        |), d0 AS (
        |  SELECT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS d
        |  FROM customer WHERE c_custkey < 10
        |), d1 AS (
        |  SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
        |    SELECT node, d FROM d0
        |    UNION ALL
        |    SELECT e.v AS node, d0.d + e.w AS d FROM e JOIN d0 ON e.u = d0.node
        |  ) GROUP BY node
        |), d2 AS (
        |  SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
        |    SELECT node, d FROM d1
        |    UNION ALL
        |    SELECT e.v AS node, d1.d + e.w AS d FROM e JOIN d1 ON e.u = d1.node
        |  ) GROUP BY node
        |), d3 AS (
        |  SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
        |    SELECT node, d FROM d2
        |    UNION ALL
        |    SELECT e.v AS node, d2.d + e.w AS d FROM e JOIN d2 ON e.u = d2.node
        |  ) GROUP BY node
        |), d4 AS (
        |  SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
        |    SELECT node, d FROM d3
        |    UNION ALL
        |    SELECT e.v AS node, d3.d + e.w AS d FROM e JOIN d3 ON e.u = d3.node
        |  ) GROUP BY node
        |)
        |SELECT node, d FROM d4 ORDER BY node""".stripMargin,

    "q178_textrank_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), tok AS (
        |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS p FROM t
        |), adj AS (
        |  SELECT DISTINCT ws[p] AS a, ws[p + 1] AS b FROM tok
        |), e AS (
        |  SELECT DISTINCT u, v FROM (
        |    SELECT a AS u, b AS v FROM adj
        |    UNION ALL
        |    SELECT b AS u, a AS v FROM adj
        |  )
        |), deg AS (
        |  SELECT u, count(*) AS d FROM e GROUP BY 1
        |), ed AS (
        |  SELECT e.u, e.v, d.d FROM e JOIN deg d USING (u)
        |), r0 AS (
        |  SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM deg
        |), i1 AS (
        |  SELECT v AS node, CAST(150000 + (850 * sum(r // d)) // 1000 AS BIGINT) AS r
        |  FROM ed JOIN r0 ON ed.u = r0.node GROUP BY v
        |), i2 AS (
        |  SELECT v AS node, CAST(150000 + (850 * sum(r // d)) // 1000 AS BIGINT) AS r
        |  FROM ed JOIN i1 ON ed.u = i1.node GROUP BY v
        |), i3 AS (
        |  SELECT v AS node, CAST(150000 + (850 * sum(r // d)) // 1000 AS BIGINT) AS r
        |  FROM ed JOIN i2 ON ed.u = i2.node GROUP BY v
        |)
        |SELECT node, r FROM i3 ORDER BY r DESC, node LIMIT 20""".stripMargin
  )
}
