package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
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
        |SELECT node, r FROM i3 ORDER BY node""".stripMargin
  )
}
