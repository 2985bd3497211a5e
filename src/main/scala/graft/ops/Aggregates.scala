package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation operator family (delegated in the reference via
  * /root/reference/main.go:106; MySQL executes them server-side).
  *
  * Scale posture: every groupBy below compiles to Spark's two-phase hash
  * aggregate — partial (map-side combine) before the shuffle, final
  * after — so the shuffle volume is O(groups), not O(rows). The
  * exceptions are called out inline: exact count-distinct carries the
  * distinct keys through the shuffle (use approx_count_distinct at
  * 100 TB when ±2% is acceptable), and collect_list is bounded only by
  * group size (safe here: groups are nation-sized).
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  /** Mergeable per-key aggregate state — the incremental-materialized-
    * view pattern (dbt incremental models / DBSP): keep (n, sx, mn, mx)
    * per key; a new batch is aggregated ALONE and merged into the
    * summary with a second |keys|-sized aggregation. The 100 TB base is
    * read once ever; each refresh shuffles O(summary + delta-keys)
    * partial rows, not the base. avg/derived stats come off the state
    * (sx/n), which is exactly why the state carries sums, not avgs —
    * avgs don't merge.
    */
  def aggState(df: DataFrame, key: String, x: String): DataFrame =
    df.groupBy(col(key)).agg(
      count(lit(1)).as("n"), sum(col(x)).as("sx"),
      min(col(x)).as("mn"), max(col(x)).as("mx"))

  /** Merge any number of aggState relations: union + one keyed agg.
    * Each state component has a merge that is its own combine (sum/sum/
    * min/max), so the merged state is bit-identical in SHAPE to a
    * from-scratch aggState — the equality q148's oracle asserts.
    */
  def mergeAggStates(key: String, states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(col(key))
      .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
           min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  val queries: Map[String, Q] = Map(
    // Incremental aggregate maintenance: the summary of a pre-cutoff
    // base merged with a post-cutoff delta batch must equal the full
    // recompute — and the ORACLE IS the full recompute, so the gate
    // asserts incremental ≡ recompute on real data, not just shape.
    // The measure is carried as exact integer CENTS: the state is then
    // bit-exact however it is split/merged (no float-sum drift between
    // refresh cadences), and the derived average is an exact integer
    // floor-division both engines replay identically — the same
    // integer-arithmetic oracle discipline as q136/q137.
    "q148_incremental_agg" -> ((s, d) => {
      val orders = T.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      val cut = lit("1996-01-01").cast("timestamp")
      val base  = orders.filter(col("o_orderdate") <  cut)
      val delta = orders.filter(col("o_orderdate") >= cut)
      mergeAggStates("o_custkey",
          aggState(base,  "o_custkey", "cents"),
          aggState(delta, "o_custkey", "cents"))
        .select(col("o_custkey"), col("n"),
          (col("sx") / lit(100.0)).as("sum_price"),
          (col("mn") / lit(100.0)).as("min_price"),
          (col("mx") / lit(100.0)).as("max_price"),
          expr("CAST((sx * 100) DIV n AS BIGINT)").as("avg_price_4dp"))
        .orderBy(col("o_custkey"))
    }),

    // COUNT(DISTINCT) — expands to a two-shuffle plan (distinct then
    // count). The approx_ variant is the 100 TB path: single pass, HLL
    // sketch, mergeable. Both exercised; only exact ones oracle-compared.
    "q21_count_distinct" -> ((s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))),

    // GROUP_CONCAT equivalent: collect_list + array_sort + array_join
    // gives MySQL's GROUP_CONCAT(... ORDER BY ...) deterministically.
    "q22_group_concat" -> ((s, d) =>
      T.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy(col("n_regionkey"))),

    // GROUP_CONCAT fidelity extras (MySQL surface the reference
    // delegates): custom SEPARATOR and a descending inner ORDER BY —
    // sort_array(…, asc=false) + array_join with the separator.
    "q22b_group_concat_variants" -> ((s, d) =>
      T.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(sort_array(collect_list(col("n_name")), asc = false), " | ")
            .as("nations_desc"),
          array_join(sort_array(collect_list(col("n_nationkey").cast("string"))), "")
            .as("keys_concat"))
        .orderBy(col("n_regionkey"))),

    // HAVING = filter over the aggregated frame.
    "q23_having" -> ((s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
             count(lit(1)).as("n_items"))
        .filter(col("total_qty") > 15000)
        .orderBy(col("l_suppkey"))),

    // GROUPING() introspection (MySQL 8 surface): distinguishes a
    // rollup subtotal row from a genuine NULL grouping key.
    "q24b_rollup_grouping" -> ((s, d) =>
      T.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             grouping(col("l_returnflag")).cast("int").as("g_flag"),
             grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    // WITH ROLLUP (MySQL surface) — hierarchical subtotals.
    "q24_rollup" -> ((s, d) =>
      T.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // CUBE — a superset MySQL 5.7 lacks (SURVEY.md §2.2): all grouping
    // combinations in one pass.
    "q25_cube" -> ((s, d) =>
      T.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // Statistical aggregates.
    "q26_stats" -> ((s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(var_pop(col("l_discount")), 6).as("varp_disc"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"))
        .orderBy(col("l_returnflag"))),

    // GROUPING SETS via Spark SQL (the declarative form Catalyst expands
    // to a single Expand + aggregate — one scan for all three groupings).
    "q27_grouping_sets" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(1) AS n
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // Approximate distinct (HLL++) vs exact — the scale path for
    // count-distinct at 100 TB. Oracle-checked on the *exact* column;
    // the approx column is asserted within rsd in ScalaTest instead, so
    // it is not part of this query (DuckDB's approx sketch differs).
    "q28_conditional_agg" -> ((s, d) =>
      T.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          round(avg(when(col("o_totalprice") > 100000, col("o_totalprice"))), 2).as("avg_big"))
        .orderBy(col("o_orderpriority"))),

    // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // quantile_cont). At 100 TB prefer approx_percentile (mergeable
    // single-pass sketch) — its rank-accuracy contract is TESTED in
    // ExtensibilitySpec ("approx_percentile lands within rank
    // tolerance"), mirroring the q21 HLL precedent. The exact form
    // shown here shuffles the group's values — used where exactness is
    // the contract.
    "q29_percentiles" -> ((s, d) =>
      // both l_quantity percentiles come from ONE percentile buffer
      // (array form) instead of two copies of the same value-count map
      // — same wall-time at sf0.1 (measured), half the aggregation
      // state, which is what matters when the buffer is per-group maps
      // over 100 TB of lineitems
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, array(0.5D, 0.9D))").as("pq"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"))
        .select(col("l_returnflag"),
          round(element_at(col("pq"), 1), 4).as("p50_qty"),
          round(element_at(col("pq"), 2), 4).as("p90_qty"),
          col("p25_price"))
        .orderBy(col("l_returnflag"))),

    // Period-over-period report: monthly revenue with month-over-month
    // and year-over-year deltas in basis points. Revenue is exact
    // floored cents; the month relation is calendar-bounded (≤ ~84
    // rows), so its lag window is a deliberate bounded-relation window
    // (DESIGN ground rule 4). Deltas can be NEGATIVE, so they use
    // floor(double ratio) — never truncating div, which disagrees with
    // DuckDB's flooring // below zero. Lags are positional on the
    // observed months (documented; a gapless calendar spine is q09's
    // recursive-CTE pattern if months can be absent).
    "q181_period_over_period" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("ym"))
      T.orders(s, d)
        .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("rev"))
        .withColumn("prev_m", lag(col("rev"), 1).over(w))
        .withColumn("prev_y", lag(col("rev"), 12).over(w))
        .select(col("ym"), col("rev"),
          expr("CAST(floor(CAST(10000 * (rev - prev_m) AS DOUBLE) / prev_m) AS BIGINT)").as("mom_bp"),
          expr("CAST(floor(CAST(10000 * (rev - prev_y) AS DOUBLE) / prev_y) AS BIGINT)").as("yoy_bp"))
        .orderBy(col("ym"))
    }),

    // ABC (Pareto) classification: parts ranked by revenue, cumulative
    // share cut at 80/95% — the inventory-analytics classic. The
    // descending cumulative revenue rides the constant-key
    // ScalableRank running sum (the q98/q117 shape — parts are a
    // vocabulary, the ranking must not be one task); class totals are
    // a 3-row rollup. Revenue is the floor of an IEEE-identical double
    // product (price × (1−discount)), exact thereafter.
    "q182_abc_classification" -> ((s, d) => {
      val parts = T.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(expr(
          "CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * 100) AS BIGINT)"))
          .as("rev"))
        .withColumn("g", lit(1))
      val tot = parts.agg(sum(col("rev")).as("tot"))
      graft.functions.ScalableRank
        .withRunningSum(parts, Seq("g"), Seq(col("rev").desc, col("l_partkey")), col("rev"), 32)
        .crossJoin(broadcast(tot))
        .withColumn("share_bp", expr("(10000 * rsum) div tot"))
        .withColumn("abc", expr(
          "CASE WHEN share_bp <= 8000 THEN 'A' WHEN share_bp <= 9500 THEN 'B' ELSE 'C' END"))
        .groupBy(col("abc"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("rev_cents"))
        .orderBy(col("abc"))
    }),

    // Equi-depth histogram (the ANALYZE-statistics builder a
    // cost-based optimizer consumes): 10 buckets of equal row count
    // over order value, each reporting its exact [lo, hi] cents
    // envelope and row count. Bucket assignment is the closed-form
    // ntileFrom over a constant-key ScalableRank ranking (the whole
    // table is one "group" — exactly the regime the two-phase
    // decomposition exists for); the rollup is 10 rows.
    "q183_equidepth_histogram" -> ((s, d) => {
      val o = T.orders(s, d)
        .select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        .withColumn("g", lit(1))
      graft.functions.ScalableRank
        .withRanks(o, Seq("g"), Seq(col("cents"), col("o_orderkey")),
          Seq(col("cents"), col("o_orderkey")), 32)
        .withColumn("bucket",
          graft.functions.ScalableRank.ntileFrom(col("rn"), col("ntot"), 10))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        .orderBy(col("bucket"))
    }),

    // Higher-moment shape statistics (skewness + excess kurtosis) per
    // return flag — the distribution-shape profile q29's percentiles
    // and q28's stddev don't capture. NOT Spark's skewness()/DuckDB's
    // skewness(): their bias corrections differ (population g1 vs
    // sample G1), so both engines compute the same explicit
    // central-moment algebra from raw power sums. l_quantity is
    // integer-valued ≤ 50, so s1..s4 are sums of exact integers in
    // double — order-independent below 2^53, hence engine-exact (at
    // 100 TB row counts the power sums exceed 2^53: aggregate per
    // partition into HUGEINT-style split sums or center first — the
    // documented trade, same family as q175's integer images).
    "q219_moment_stats" -> ((s, d) =>
      T.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").as("q"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).as("s1"),
          sum(col("q") * col("q")).as("s2"),
          sum(col("q") * col("q") * col("q")).as("s3"),
          sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
        .select(col("l_returnflag"), col("n"),
          round(expr("s1 / n"), 4).as("mean_q"),
          round(expr("sqrt(s2 / n - (s1 / n) * (s1 / n))"), 4).as("sd_pop"),
          round(expr(
            """(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
              | / pow(s2 / n - (s1 / n) * (s1 / n), 1.5)""".stripMargin), 4).as("skew_g1"),
          round(expr(
            """(s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              |  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
              | / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3""".stripMargin), 4)
            .as("exkurt_g2"))
        .orderBy(col("l_returnflag"))),

    // Benford first-digit audit over order values — the classic
    // fabricated-data / unit-mix forensic: observed leading-digit
    // shares vs Benford's log10(1+1/d) expectation. The expectation
    // ships as a LITERAL ppm table (not computed) so no libm log sits
    // under an integer comparison; observed shares are exact integer
    // ppm of a 9-row rollup. One partial-aggregable digit count over
    // the scan — nothing else touches the table.
    "q212_benford_audit" -> ((s, d) => {
      val digits = T.orders(s, d)
        .select(substring(expr("CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING)"), 1, 1)
          .cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("t"))
      digits.crossJoin(broadcast(tot))
        .withColumn("obs_ppm", expr("(1000000 * n) div t"))
        .withColumn("exp_ppm", expr(
          """CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
            | WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
            | WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END""".stripMargin))
        .select(col("digit").cast("long").as("digit"), col("n"),
          col("obs_ppm"), col("exp_ppm").cast("long").as("exp_ppm"),
          abs(col("obs_ppm") - col("exp_ppm")).cast("long").as("dev_ppm"))
        .orderBy(col("digit"))
    }),

    // Split-conformal prediction interval — the distribution-free
    // uncertainty wrapper modern eval stacks put around ANY point
    // model: calibrate on a deterministic half (residual = |y − ŷ|,
    // here against an integer per-segment mean model), take the
    // ceil(0.9·(n+1))-th smallest calibration residual as the radius,
    // and AUDIT the promised ≥90% coverage on the held-out half. The
    // whole construction is exact integers: truncated integer mean as
    // ŷ, order-statistic selection by rank equality (ScalableRank —
    // segments are the low-card-key regime), ppm coverage by integer
    // division. The md5 coin makes the calibration split itself
    // oracle-replayable, like q228's resampling.
    "q243_conformal_interval" -> ((s, d) => {
      val cust = broadcast(T.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg")))
      val o = T.orders(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("seg"), col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .withColumn("is_calib",
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long") % 2 === 0)
      val model = o.filter(col("is_calib"))
        .groupBy(col("seg").as("sg"))
        .agg(count(lit(1)).as("n_calib"), sum(col("cents")).as("sc"))
        .withColumn("mean_cents", expr("sc div n_calib"))
        .select(col("sg"), col("n_calib"), col("mean_cents"))
      val resid = o.filter(col("is_calib"))
        .join(broadcast(model), col("seg") === col("sg"))
        .select(col("seg"), col("o_orderkey"),
          abs(col("cents") - col("mean_cents")).as("r"))
      val ranked = graft.functions.ScalableRank.withRanks(resid, Seq("seg"),
        Seq(col("r"), col("o_orderkey")), Seq(col("r"), col("o_orderkey")), 32)
      val radius = ranked
        .filter(col("rn") === least(expr("(9 * (ntot + 1) + 9) div 10"), col("ntot")))
        .select(col("seg").as("sg2"), col("r").as("q90_resid_cents"))
      o.filter(!col("is_calib"))
        .join(broadcast(model), col("seg") === col("sg"))
        .join(broadcast(radius), col("seg") === col("sg2"))
        .groupBy(col("seg"))
        .agg(max(col("n_calib")).as("n_calib"),
             count(lit(1)).as("n_test"),
             max(col("mean_cents")).as("model_mean_cents"),
             max(col("q90_resid_cents")).as("q90_resid_cents"),
             sum(when(abs(col("cents") - col("mean_cents")) <= col("q90_resid_cents"), 1L)
               .otherwise(0L)).as("n_within"))
        .withColumn("coverage_ppm", expr("(1000000 * n_within) div n_test"))
        .orderBy(col("seg"))
    }),

    // Weighted percentiles — the volume-weighted price quartiles q29's
    // unweighted percentiles cannot express (a 1-unit line and a
    // 50-unit line are NOT the same evidence about price level). Exact
    // lower-weighted-quantile semantics: sort by value, take the first
    // value whose cumulative weight reaches p·W — evaluated as the
    // integer cross-product test 100·cumw ≥ p100·W, so no float ever
    // touches the selection. The running weight rides ScalableRank's
    // two-phase range-partitioned sum (3 return flags = the low-card
    // window-key regime where Window.partitionBy must not be used);
    // the percentile pick is then one partial-aggregable conditional
    // min per flag.
    "q239_weighted_percentile" -> ((s, d) => {
      val li = T.lineitem(s, d).select(col("l_returnflag").as("rf"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"),
        col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      val run = graft.functions.ScalableRank.withRunningSum(li, Seq("rf"),
        Seq(col("cents"), col("l_orderkey"), col("l_partkey"), col("l_linenumber")),
        col("qty"), 32)
      val w = run.groupBy(col("rf")).agg(max(col("rsum")).as("wtot"))
      run.join(broadcast(w), "rf")
        .groupBy(col("rf"))
        .agg(max(col("wtot")).as("w_total"),
          min(when(col("rsum") * 100 >= col("wtot") * 25, col("cents"))).as("wp25_cents"),
          min(when(col("rsum") * 100 >= col("wtot") * 50, col("cents"))).as("wp50_cents"),
          min(when(col("rsum") * 100 >= col("wtot") * 75, col("cents"))).as("wp75_cents"))
        .orderBy(col("rf"))
    }),

    // Poisson-bootstrap confidence interval for the mean order value
    // per market segment — the error bar every aggregate dashboard
    // omits. Classic n-out-of-n resampling needs n draws WITH
    // replacement per replicate (a shuffle per replicate at scale);
    // the Poisson bootstrap replaces that with an independent
    // Poisson(1) weight per (row, replicate), which needs NO
    // coordination — one map-side pass emits all B=32 replicates, and
    // partial aggregation collapses each partition to segments×B
    // cells before the exchange. The Poisson draw is the md5 coin
    // (q86's portable hash) against the exact cumulative-ppm table of
    // Poisson(1) — an integer comparison, so both engines draw the
    // SAME replicate weights and the oracle replays the resampling
    // bit-for-bit. CI bounds are the 2.5%/97.5% interpolated
    // percentiles of the replicate means.
    "q228_bootstrap_ci" -> ((s, d) => {
      val cust = broadcast(T.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")))
      val base = T.orders(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderkey"), col("o_totalprice"))
      val reps = base.select(col("seg"), col("o_orderkey"), col("o_totalprice"),
          explode(expr("sequence(0, 31)")).as("b"))
        .withColumn("r", expr(
          "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), ':', CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % 10000"))
        .withColumn("wt", expr(
          """CASE WHEN r < 3679 THEN 0 WHEN r < 7358 THEN 1 WHEN r < 9197 THEN 2
            |     WHEN r < 9810 THEN 3 WHEN r < 9963 THEN 4 ELSE 5 END""".stripMargin))
        .groupBy(col("seg"), col("b"))
        .agg(sum(col("wt") * col("o_totalprice")).as("s"),
             sum(col("wt")).as("nw"))
        .withColumn("m", col("s") / col("nw"))
      val obs = base.groupBy(col("seg"))
        .agg(count(lit(1)).as("n_orders"), avg(col("o_totalprice")).as("mean0"))
      reps.groupBy(col("seg"))
        .agg(expr("CAST(percentile(m, 0.025) AS DOUBLE)").as("lo"),
             expr("CAST(percentile(m, 0.975) AS DOUBLE)").as("hi"))
        .join(obs, "seg")
        .select(col("seg"), col("n_orders"),
          round(col("mean0"), 2).as("mean_price"),
          round(col("lo"), 2).as("ci_lo"),
          round(col("hi"), 2).as("ci_hi"))
        .orderBy(col("seg"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q243_conformal_interval" ->
      """WITH o AS (
        |  SELECT c.c_mktsegment AS seg, od.o_orderkey,
        |         CAST(round(od.o_totalprice * 100) AS BIGINT) AS cents,
        |         CAST(('0x' || substr(md5(CAST(od.o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
        |           AS is_calib
        |  FROM orders od JOIN customer c ON od.o_custkey = c.c_custkey
        |), model AS (
        |  SELECT seg AS sg, CAST(count(*) AS BIGINT) AS n_calib,
        |         CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_cents
        |  FROM o WHERE is_calib GROUP BY 1
        |), resid AS (
        |  SELECT o.seg, o.o_orderkey, abs(o.cents - m.mean_cents) AS r
        |  FROM o JOIN model m ON o.seg = m.sg WHERE o.is_calib
        |), ranked AS (
        |  SELECT seg, r,
        |         row_number() OVER (PARTITION BY seg ORDER BY r, o_orderkey) AS rn,
        |         count(*) OVER (PARTITION BY seg) AS ntot
        |  FROM resid
        |), radius AS (
        |  SELECT seg AS sg2, r AS q90 FROM ranked
        |  WHERE rn = least((9 * (ntot + 1) + 9) // 10, ntot)
        |)
        |SELECT o.seg, max(m.n_calib) AS n_calib, CAST(count(*) AS BIGINT) AS n_test,
        |       max(m.mean_cents) AS model_mean_cents,
        |       CAST(max(rad.q90) AS BIGINT) AS q90_resid_cents,
        |       CAST(sum(CASE WHEN abs(o.cents - m.mean_cents) <= rad.q90
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
        |       (1000000 * CAST(sum(CASE WHEN abs(o.cents - m.mean_cents) <= rad.q90
        |                                THEN 1 ELSE 0 END) AS BIGINT))
        |         // CAST(count(*) AS BIGINT) AS coverage_ppm
        |FROM o JOIN model m ON o.seg = m.sg JOIN radius rad ON o.seg = rad.sg2
        |WHERE NOT is_calib GROUP BY 1 ORDER BY o.seg""".stripMargin,

    "q239_weighted_percentile" ->
      """WITH li AS (
        |  SELECT l_returnflag AS rf,
        |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
        |         CAST(l_quantity AS BIGINT) AS qty,
        |         l_orderkey, l_partkey, l_linenumber
        |  FROM lineitem
        |), run AS (
        |  SELECT rf, cents,
        |         CAST(sum(qty) OVER (PARTITION BY rf
        |           ORDER BY cents, l_orderkey, l_partkey, l_linenumber
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum
        |  FROM li
        |), w AS (SELECT rf, max(rsum) AS wtot FROM run GROUP BY 1)
        |SELECT run.rf, max(w.wtot) AS w_total,
        |       min(CASE WHEN rsum * 100 >= wtot * 25 THEN cents END) AS wp25_cents,
        |       min(CASE WHEN rsum * 100 >= wtot * 50 THEN cents END) AS wp50_cents,
        |       min(CASE WHEN rsum * 100 >= wtot * 75 THEN cents END) AS wp75_cents
        |FROM run JOIN w USING (rf)
        |GROUP BY 1 ORDER BY rf""".stripMargin,

    "q228_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT c.c_mktsegment AS seg, o.o_orderkey, o.o_totalprice
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |), reps AS (
        |  SELECT seg, b,
        |         sum(wt * o_totalprice) / sum(wt) AS m
        |  FROM (
        |    SELECT seg, o_totalprice, b,
        |      CASE WHEN r < 3679 THEN 0 WHEN r < 7358 THEN 1 WHEN r < 9197 THEN 2
        |           WHEN r < 9810 THEN 3 WHEN r < 9963 THEN 4 ELSE 5 END AS wt
        |    FROM (
        |      SELECT seg, o_totalprice, b,
        |        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS r
        |      FROM base CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
        |    )
        |  )
        |  GROUP BY 1, 2
        |), ci AS (
        |  SELECT seg,
        |         CAST(percentile_cont(0.025) WITHIN GROUP (ORDER BY m) AS DOUBLE) AS lo,
        |         CAST(percentile_cont(0.975) WITHIN GROUP (ORDER BY m) AS DOUBLE) AS hi
        |  FROM reps GROUP BY 1
        |), obs AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS n_orders,
        |         avg(o_totalprice) AS mean0
        |  FROM base GROUP BY 1
        |)
        |SELECT obs.seg, obs.n_orders, round(obs.mean0, 2) AS mean_price,
        |       round(ci.lo, 2) AS ci_lo, round(ci.hi, 2) AS ci_hi
        |FROM obs JOIN ci ON obs.seg = ci.seg
        |ORDER BY obs.seg""".stripMargin,

    "q148_incremental_agg" ->
      """WITH c AS (
        |  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |)
        |SELECT o_custkey, count(*) AS n,
        | CAST(sum(cents) AS BIGINT) / 100.0 AS sum_price,
        | min(cents) / 100.0 AS min_price,
        | max(cents) / 100.0 AS max_price,
        | CAST((CAST(sum(cents) AS BIGINT) * 100) // count(*) AS BIGINT) AS avg_price_4dp
        |FROM c GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q21_count_distinct" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q22_group_concat" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q22b_group_concat_variants" ->
      """SELECT n_regionkey,
        | string_agg(n_name, ' | ' ORDER BY n_name DESC) AS nations_desc,
        | string_agg(CAST(n_nationkey AS VARCHAR), ''
        |            ORDER BY CAST(n_nationkey AS VARCHAR)) AS keys_concat
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q23_having" ->
      """SELECT l_suppkey, round(sum(l_quantity),2) AS total_qty, count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey
        |HAVING round(sum(l_quantity),2) > 15000
        |ORDER BY l_suppkey""".stripMargin,

    "q24_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q24b_rollup_grouping" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(grouping(l_returnflag) AS INT) AS g_flag,
        | CAST(grouping(l_linestatus) AS INT) AS g_status
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q25_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q26_stats" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity),4) AS sd_qty,
        | round(stddev_pop(l_quantity),4) AS sdp_qty,
        | round(var_samp(l_discount),6) AS var_disc,
        | round(var_pop(l_discount),6) AS varp_disc,
        | round(min(l_extendedprice),2) AS min_price,
        | round(max(l_extendedprice),2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q27_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q28_conditional_agg" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | round(avg(CASE WHEN o_totalprice > 100000 THEN o_totalprice END), 2) AS avg_big
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q29_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q181_period_over_period" ->
      """WITH m AS (
        |  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT ym, rev,
        |         lag(rev, 1) OVER (ORDER BY ym) AS prev_m,
        |         lag(rev, 12) OVER (ORDER BY ym) AS prev_y
        |  FROM m
        |)
        |SELECT ym, rev,
        |       CAST(floor(CAST(10000 * (rev - prev_m) AS DOUBLE) / prev_m) AS BIGINT) AS mom_bp,
        |       CAST(floor(CAST(10000 * (rev - prev_y) AS DOUBLE) / prev_y) AS BIGINT) AS yoy_bp
        |FROM l ORDER BY ym""".stripMargin,

    "q182_abc_classification" ->
      """WITH parts AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(floor(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * 100)
        |                       AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1
        |), t AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM parts),
        |r AS (
        |  SELECT l_partkey, rev,
        |         CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum
        |  FROM parts
        |), c AS (
        |  SELECT rev, (10000 * rsum) // tot AS share_bp FROM r CROSS JOIN t
        |)
        |SELECT CASE WHEN share_bp <= 8000 THEN 'A'
        |            WHEN share_bp <= 9500 THEN 'B' ELSE 'C' END AS abc,
        |       count(*) AS n_parts, CAST(sum(rev) AS BIGINT) AS rev_cents
        |FROM c GROUP BY 1 ORDER BY abc""".stripMargin,

    "q183_equidepth_histogram" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), b AS (
        |  SELECT cents,
        |         CAST(ntile(10) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bucket
        |  FROM o
        |)
        |SELECT bucket, count(*) AS n,
        |       CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q219_moment_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |         sum(l_quantity) AS s1,
        |         sum(l_quantity * l_quantity) AS s2,
        |         sum(l_quantity * l_quantity * l_quantity) AS s3,
        |         sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l_returnflag, n,
        |       round(s1 / n, 4) AS mean_q,
        |       round(sqrt(s2 / n - (s1 / n) * (s1 / n)), 4) AS sd_pop,
        |       round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
        |             / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) AS skew_g1,
        |       round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |             / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3, 4) AS exkurt_g2
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q212_benford_audit" ->
      """WITH dg AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
        |              AS INTEGER) AS digit
        |  FROM orders
        |), c AS (
        |  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dg GROUP BY 1
        |), t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
        |SELECT CAST(digit AS BIGINT) AS digit, n,
        |       (1000000 * n) // t AS obs_ppm,
        |       CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
        |            WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
        |            WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END AS BIGINT) AS exp_ppm,
        |       CAST(abs((1000000 * n) // t -
        |            CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
        |            WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
        |            WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END) AS BIGINT) AS dev_ppm
        |FROM c CROSS JOIN t
        |ORDER BY digit""".stripMargin
  )
}
