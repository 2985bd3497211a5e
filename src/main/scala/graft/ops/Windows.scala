package graft.ops

import graft.T
import graft.functions.ScalableRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window function family (MySQL ≥8.0 surface through the reference's
  * passthrough, /root/reference/main.go:106).
  *
  * Scale posture: a window spec shuffles once on partitionBy keys and
  * sorts within partitions. Two regimes:
  *  - high-cardinality keys (custkey/suppkey/user_id): partition sizes
  *    are bounded by data semantics (orders per customer, lines per
  *    supplier), so the plain window is already the scalable plan;
  *  - LOW-cardinality keys (o_orderpriority: 5 values, o_orderstatus:
  *    3): a plain window funnels n/|k| rows through one task — q31 and
  *    q35 use the two-phase range-partitioned ranking in
  *    functions/ScalableRank.scala instead (round-3 verdict item 1),
  *    machine-audited in PlanAuditSpec.
  * Window ORDER BYs always carry a unique tiebreaker so results are
  * deterministic across engines.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  /** Named WINDOW clause (MySQL 8 syntax): one window definition
    * shared by rank and a running sum — engine-neutral shared SQL; the
    * unique (date, orderkey) ordering makes the default RANGE frame
    * row-deterministic in both engines.
    */
  private val namedWindowSql =
    """SELECT o_custkey, o_orderkey,
      | CAST(rank() OVER w AS BIGINT) AS rk,
      | round(sum(o_totalprice) OVER w, 2) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q39_named_window" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(namedWindowSql)
    }),

    // Top-k per group: the classic export query (SURVEY.md §2.2).
    // row_number + filter prunes to k rows per key *before* anything
    // downstream — at scale this is the shuffle-once alternative to a
    // global sort.
    "q30_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
                round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Ranking family: row_number / rank / dense_rank / ntile — over a
    // 5-value partition key, the case a plain Window.partitionBy CANNOT
    // survive at scale (each key = one task sorting n/5 rows). Uses the
    // two-phase range-partitioned decomposition instead: local ranks
    // per range partition + broadcast prefix-sum offsets
    // (functions/ScalableRank.scala). Same relation, same oracle; the
    // plan's data exchange is rangepartitioning, machine-asserted in
    // PlanAuditSpec.
    "q31_ranking" -> ((s, d) => {
      val ranked = ScalableRank.withRanks(
        T.orders(s, d).select("o_orderpriority", "o_orderkey", "o_totalprice"),
        keys = Seq("o_orderpriority"),
        order = Seq(col("o_totalprice").desc, col("o_orderkey")),
        tie = Seq(col("o_totalprice"), col("o_orderkey")),
        numPartitions = s.conf.get("spark.sql.shuffle.partitions").toInt)
      ranked
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          col("rn"), col("rnk").as("rnk"), col("drnk").as("drnk"),
          ScalableRank.ntileFrom(col("rn"), col("ntot"), 4).as("quartile"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // Analytic offsets: lag / lead with defaults.
    "q32_lag_lead" -> ((s, d) => {
      // NB: (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // data — l_partkey completes the key for deterministic ordering.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      T.lineitem(s, d)
        .filter(col("l_suppkey") <= 20)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          round(col("l_quantity"), 2).as("qty"),
          round(lag(col("l_quantity"), 1).over(w), 2).as("prev_qty"),
          round(lead(col("l_quantity"), 1, -1.0).over(w), 2).as("next_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    }),

    // Frames: running total (ROWS UNBOUNDED), moving average (ROWS 2
    // PRECEDING) — both over the high-cardinality custkey, where the
    // plain window is the right plan — and a value-RANGE frame whose
    // partition key is o_orderpriority (5 values): the same
    // low-cardinality shape as q31/q35. The trailing-range count is
    // decomposed as a difference of cumulative counts,
    //   n_near(v) = cnt_le(v) − cnt_le(v − 1001),
    // each read off ONE scalable running sum over a union of data rows
    // (weight 1) and per-row probe rows at v−1001 (weight 0, sorted
    // after data rows of equal value so ≤ is inclusive) — probes tie
    // only with other probes, so the running sum stays deterministic.
    "q33_frames" -> ((s, d) => {
      val o = T.orders(s, d)
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      // keep the key under its real name so PlanAuditSpec's negative
      // assertion (no hashpartitioning on it) stays meaningful
      val data = o.select(col("o_orderkey").as("jk"), col("o_orderpriority"),
        col("o_orderkey").as("val"), lit(1L).as("w"), lit(0).as("probe"))
      val probes = o.select(col("o_orderkey").as("jk"), col("o_orderpriority"),
        (col("o_orderkey") - 1001).as("val"), lit(0L).as("w"), lit(1).as("probe"))
      val near = ScalableRank.withRunningSum(
          data.unionAll(probes), Seq("o_orderpriority"),
          Seq(col("val"), col("probe")), col("w"), p)
        .groupBy(col("jk"))
        .agg((max(when(col("probe") === 0, col("rsum"))) -
              max(when(col("probe") === 1, col("rsum")))).as("n_near_keys"))
      val wOrd = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = wOrd.rowsBetween(-2, Window.currentRow)
      o.select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(run), 2).as("run_total"),
          round(avg(col("o_totalprice")).over(mov), 4).as("mov_avg3"))
        .join(near, col("o_orderkey") === col("jk"))
        .select(col("o_custkey"), col("o_orderkey"),
                col("run_total"), col("mov_avg3"), col("n_near_keys"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // first_value / last_value / nth_value over the full-partition frame
    // (last_value needs UNBOUNDED FOLLOWING to mean "partition last").
    "q34_first_last" -> ((s, d) => {
      val full = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(full).as("first_key"),
          last(col("o_orderkey")).over(full).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Time-based RANGE frame: events in the trailing hour per user —
    // the analytic twin of a sliding window aggregation, expressed as a
    // numeric range over epoch seconds (one shuffle on user_id).
    "q36_time_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ep"))
        .rangeBetween(-3599, Window.currentRow)
      graft.T.events(s, d)
        .withColumn("ep", unix_timestamp(col("ts")))
        .select(
          col("user_id"), col("event_id"), col("ep"),
          count(lit(1)).over(w).as("n_trailing_1h"),
          round(sum(col("value")).over(w), 2).as("v_trailing_1h"))
        .orderBy(col("user_id"), col("ep"), col("event_id"))
    }),

    // Distribution functions — o_orderstatus has 3 values, so this is
    // the same low-cardinality shape as q31: percent_rank/cume_dist are
    // derived from the two-phase global rank and cumulative count
    // instead of a 3-task window (ScalableRank, plan-audited).
    "q35_distribution" -> ((s, d) => {
      val ranked = ScalableRank.withRanks(
        T.orders(s, d).select("o_orderstatus", "o_orderkey", "o_totalprice"),
        keys = Seq("o_orderstatus"),
        order = Seq(col("o_totalprice"), col("o_orderkey")),
        tie = Seq(col("o_totalprice"), col("o_orderkey")),
        numPartitions = s.conf.get("spark.sql.shuffle.partitions").toInt)
      ranked
        .select(
          col("o_orderstatus"), col("o_orderkey"),
          round(ScalableRank.percentRankFrom(col("rnk"), col("ntot")), 6).as("pct_rank"),
          round(ScalableRank.cumeDistFrom(col("cume"), col("ntot")), 6).as("cdist"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q39_named_window" -> namedWindowSql,

    "q30_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q31_ranking" ->
      """SELECT o_orderpriority, o_orderkey,
        | row_number() OVER w AS rn,
        | rank() OVER w AS rnk,
        | dense_rank() OVER w AS drnk,
        | ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q32_lag_lead" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        | round(l_quantity,2) AS qty,
        | round(lag(l_quantity, 1) OVER w, 2) AS prev_qty,
        | round(lead(l_quantity, 1, -1.0) OVER w, 2) AS next_qty
        |FROM lineitem
        |WHERE l_suppkey <= 20
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "q33_frames" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
        | round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3,
        | count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_near_keys
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q34_first_last" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_key,
        | last_value(o_orderkey) OVER w AS last_key,
        | nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q36_time_range_frame" ->
      """SELECT user_id, event_id, ep,
        | count(*) OVER w AS n_trailing_1h,
        | round(sum(value) OVER w, 2) AS v_trailing_1h
        |FROM (SELECT user_id, event_id, value,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ep
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ep, event_id""".stripMargin,

    "q35_distribution" ->
      """SELECT o_orderstatus, o_orderkey,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin
  )
}
