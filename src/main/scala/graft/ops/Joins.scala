package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operator family. The reference can only exercise joins through
  * the MySQL passthrough (/root/reference/main.go:106 — MySQL picks
  * nested-loop/hash internally); here each join is a declarative plan and
  * Catalyst + AQE pick the physical strategy. Scale posture:
  *  - fact⋈fact equi-joins (lineitem⋈orders) shuffle on the join key —
  *    the unavoidable 100 TB shape; AQE coalesces/splits skewed
  *    partitions at runtime.
  *  - fact⋈dimension joins broadcast the dimension (explicit
  *    broadcast() hint) so the fact side never moves.
  *  - theta/non-equi joins deliberately keep one side broadcast-small —
  *    a non-equi join with two large sides is an O(n·m) cross product
  *    and must be bucketed/banded instead (see Dedup/VectorOps for the
  *    banded versions of that idea).
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Inner equi-join fact⋈fact; Catalyst chooses sort-merge (both big),
    // AQE may demote to broadcast at small SF. Partial aggs after join.
    "q10_join_inner" -> ((s, d) => {
      val li = T.lineitem(s, d)
      val o  = T.orders(s, d).filter(col("o_orderstatus") === "F")
      li.join(o, col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // Left outer join preserving the orders side; count(l_orderkey)
    // counts only matched rows (null-skipping), exactly SQL semantics.
    "q11_join_left" -> ((s, d) => {
      val o  = T.orders(s, d)
      val li = T.lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_orderkey")).as("n_big_items"))
        .orderBy(col("o_orderkey"))
    }),

    // Right outer join preserving the (broadcast) nation side.
    "q12_join_right" -> ((s, d) => {
      val c = T.customer(s, d).filter(col("c_acctbal") > 5000)
      c.join(T.nationDim(s, d), col("c_nationkey") === col("n_nationkey"), "right_outer")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_rich"))
        .orderBy(col("n_nationkey"))
    }),

    // Full outer join — a capability upgrade over the MySQL dialect,
    // which lacks FULL OUTER entirely (SURVEY.md §2.2).
    "q13_join_full" -> ((s, d) => {
      val neg = T.customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      val big = T.orders(s, d).filter(col("o_totalprice") > 150000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
      neg.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("acctbal"), col("n_big_orders"))
        .orderBy(col("custkey"))
    }),

    // Left semi = EXISTS. Only customer columns flow downstream, so the
    // probe side is never widened — the cheap way to run EXISTS at scale.
    "q14_join_semi" -> ((s, d) => {
      val big = T.orders(s, d).filter(col("o_totalprice") > 200000)
      T.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Left anti = NOT EXISTS.
    "q15_join_anti" -> ((s, d) => {
      val big = T.orders(s, d).filter(col("o_totalprice") > 200000)
      T.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Cross join of two fixed-cardinality dims (5×5) — the only safe
    // cross-join shape; anything larger must be banded (see Dedup).
    "q16_join_cross" -> ((s, d) => {
      val r1 = T.region(s, d).select(col("r_name").as("r1_name"))
      val r2 = T.region(s, d).select(col("r_name").as("r2_name"))
      r1.crossJoin(r2).orderBy(col("r1_name"), col("r2_name"))
    }),

    // Theta (non-equi) join: supplier (tiny, broadcast) × customer with
    // an inequality predicate → broadcast-nested-loop, fact side streams.
    "q17_join_theta" -> ((s, d) => {
      val sup = broadcast(T.supplier(s, d))
      T.customer(s, d)
        .join(sup, col("c_acctbal") > col("s_acctbal"), "inner")
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_richer_cust"))
        .orderBy(col("s_suppkey"))
    }),

    // 5-table star join: one fact-fact shuffle join + broadcast dims.
    // This is the canonical 100 TB shape: lineitem⋈orders shuffles once,
    // customer/nation/region ride along as broadcasts.
    "q18_join_star" -> ((s, d) => {
      val li = T.lineitem(s, d)
      val o  = T.orders(s, d)
      val c  = T.customer(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(T.nationDim(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(T.regionDim(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // Banded interval (range) join: shipments falling inside a 30-day
    // window after each order's date. The banded equi-join replaces the
    // broadcast-nested-loop a raw theta join would plan — see
    // graft.functions.RangeJoin for the cost model.
    "q43_range_join_banded" -> ((s, d) => {
      val o = T.orders(s, d).filter(col("o_custkey") <= 20)
        .select(col("o_orderkey"), col("o_orderdate"),
                (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("o_end"))
      val l = T.lineitem(s, d).filter(col("l_suppkey") <= 3)
        .select(col("l_shipdate"))
      graft.functions.RangeJoin
        .bandedIntervalJoin(l, "l_shipdate", o, "o_orderdate", "o_end",
                            bandSeconds = 30L * 24 * 3600)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_shipments"))
        .orderBy(col("o_orderkey"))
    }),

    // Self join via aliasing: unordered order pairs per customer.
    "q19_join_self" -> ((s, d) => {
      val a = T.orders(s, d).select(col("o_custkey").as("custkey"), col("o_orderkey").as("k1"))
      val b = T.orders(s, d).select(col("o_custkey").as("custkey2"), col("o_orderkey").as("k2"))
      a.join(b, col("custkey") === col("custkey2") && col("k1") < col("k2"))
        .groupBy(col("custkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("custkey"))
    }),

    // Referential-integrity audit — the post-export data-quality gate a
    // mysql2parquet run should end with: per FK edge, child rows and
    // orphan rows (non-null child keys with no parent, SQL MATCH SIMPLE
    // semantics — NULL FKs are not violations; planted orphans/NULLs
    // are pinned in JoinsSpec). Each edge is one left_anti join whose
    // parent side Spark broadcasts when dim-sized and shuffles when
    // not; counts collapse to one row per edge before the union, so the
    // result is |edges| rows whatever the data size.
    "q154_fk_audit" -> ((s, d) =>
      fkEdgeAudit("events.user_id->customer", T.events(s, d), "user_id",
          T.customer(s, d), "c_custkey")
        .unionByName(fkEdgeAudit("lineitem.l_orderkey->orders", T.lineitem(s, d), "l_orderkey",
          T.orders(s, d), "o_orderkey"))
        .unionByName(fkEdgeAudit("lineitem.l_partkey->part", T.lineitem(s, d), "l_partkey",
          T.part(s, d), "p_partkey"))
        .unionByName(fkEdgeAudit("lineitem.l_suppkey->supplier", T.lineitem(s, d), "l_suppkey",
          T.supplier(s, d), "s_suppkey"))
        .unionByName(fkEdgeAudit("orders.o_custkey->customer", T.orders(s, d), "o_custkey",
          T.customer(s, d), "c_custkey"))
        .orderBy(col("fk"))),

    // Market-basket association rules (support / confidence / lift)
    // over order baskets — the classic co-occurrence miner, kept exact:
    // all three metrics are integer ratios via truncating division of
    // non-negative counts. The pair generation is a basket-keyed
    // self-join (co-partitioned on l_orderkey, pairs bounded by
    // basket-size² per order — baskets are small by construction, so
    // the blow-up is a constant, not data-scaled); item totals join
    // back BROADCAST (item vocabulary ≪ fact table). A min-support
    // floor keeps the output the interesting rules, applied on the
    // exact pair counts. Lift is scaled ×1000; at 100 TB the
    // n_ab·N product widens to DECIMAL(38,0) (same posture as q152's
    // moments).
    "q166_market_basket" -> ((s, d) => {
      val items = T.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val n = items.select(countDistinct(col("ok")).as("nb"))
      basketPairCounts(items, 3)
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          expr("(1000000 * n_ab) div nb").as("support_ppm"),
          expr("(1000000 * n_ab) div n_a").as("conf_ppm"),
          expr("(CAST(1000 AS DECIMAL(38,0)) * n_ab * nb) div " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b)").as("lift_milli"))
        .orderBy(col("a"), col("b"))
    }),

    // Item-kNN collaborative filtering on the same basket substrate:
    // per item, its top-3 neighbors by co-occurrence cosine
    // n_ab / √(n_a·n_b). The cosine is a floor of IEEE-identical
    // doubles (sqrt and division are correctly rounded, inputs are
    // exact integers), so the ranking key is engine-deterministic with
    // an explicit (cos, b) tiebreak. Pair relation symmetrizes (each
    // direction once); the per-item window partitions on the item
    // VOCABULARY (high-cardinality — Window.partitionBy is the right
    // tool here, the opposite of the 5-value q31 case).
    "q168_item_similarity" -> ((s, d) => {
      val items = T.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val p = basketPairCounts(items, 2)
      val sym = p.select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"))
        .unionByName(p.select(col("b").as("a"), col("a").as("b"),
          col("n_ab"), col("n_b").as("n_a"), col("n_a").as("n_b")))
        .withColumn("cos_ppm",
          expr("CAST(floor(1000000 * n_ab / sqrt(CAST(n_a * n_b AS DOUBLE))) AS BIGINT)"))
      val w = Window.partitionBy(col("a")).orderBy(col("cos_ppm").desc, col("b"))
      sym.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("a"), col("rnk"), col("b"), col("n_ab"), col("cos_ppm"))
        .orderBy(col("a"), col("rnk"))
    }),

    // Frequent triples with Apriori candidate pruning: a triple can
    // only reach min-support if all three of its pairs do, so the pair
    // expansion is semi-joined against the (tiny, broadcast) frequent-
    // pair set BEFORE the third basket join — the candidate explosion
    // is cut at the earliest point in the plan, which is the entire
    // content of Apriori at scale. The oracle is the NAIVE unpruned
    // triple count, so the gate proves the pruning loses nothing
    // (downward-closure made executable). Joins stay basket-keyed
    // (bounded by basket size³ per basket only for survivors).
    "q172_frequent_triples" -> ((s, d) => {
      val items = T.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val fp = basketPairCounts(items, 2).select(col("a"), col("b"))
      val xy = items.as("x")
        .join(items.as("y"), col("x.ok") === col("y.ok") && col("x.item") < col("y.item"))
        .select(col("x.ok").as("ok"), col("x.item").as("a"), col("y.item").as("b"))
        .join(broadcast(fp), Seq("a", "b"), "left_semi")
      items.as("z")
        .join(xy.as("w"), col("w.ok") === col("z.ok") && col("w.b") < col("z.item"))
        .select(col("w.a").as("a"), col("w.b").as("b"), col("z.item").as("c"))
        .join(broadcast(fp.select(col("a"), col("b").as("c"))), Seq("a", "c"), "left_semi")
        .join(broadcast(fp.select(col("a").as("b"), col("b").as("c"))), Seq("b", "c"), "left_semi")
        .groupBy(col("a"), col("b"), col("c"))
        .agg(count(lit(1)).as("n_abc"))
        .filter(col("n_abc") >= 2)
        .orderBy(col("a"), col("b"), col("c"))
    }),

    // Join-skew diagnostic: before running a fan-out join, report the
    // top-20 keys by output contribution (|left|·|right| per key) and
    // their share of total join output in basis points — the "why is
    // this join 100× its input" tool, and the input to a salting or
    // skew-hint decision. Both sides collapse to per-key counts FIRST
    // (partial-aggregable), so the diagnostic costs two keyed rollups
    // + a count-sized join, never the fan-out it predicts.
    "q179_join_skew_report" -> ((s, d) => {
      val l = T.events(s, d).groupBy(col("user_id").as("k")).agg(count(lit(1)).as("nl"))
      val r = T.orders(s, d).groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("nr"))
      val m = l.join(r, "k").withColumn("blowup", col("nl") * col("nr"))
      val tot = m.agg(sum(col("blowup")).as("tot"))
      m.crossJoin(broadcast(tot))
        .select(col("k"), col("nl"), col("nr"), col("blowup"),
          expr("(10000 * blowup) div tot").as("share_bp"))
        .orderBy(col("blowup").desc, col("k"))
        .limit(20)
    }),

    // Popularity-weighted negative sampling — the word2vec/recsys
    // training-data op: for every customer, 8 candidate negatives
    // drawn ∝ item popularity by INVERTING the popularity CDF with a
    // deterministic md5 coin (the oracle replays every draw). The
    // inversion is an interval join of probe values into (cum−pop,
    // cum] popularity intervals — run as the BANDED equi-join
    // (RangeJoin's discipline on an integer axis: intervals replicate
    // into the ~pop/B bands they span, Σ replicas ≈ 512 + |items|,
    // never a nested loop). Drawn items the customer actually bought
    // are removed by an ANTI join against the purchase history —
    // exactly the false-negative filter a contrastive pipeline needs.
    "q256_negative_sampling" -> ((s, d) => {
      val pop = T.lineitem(s, d).groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("pop"))
        .withColumn("g", lit(1))
      val cum = graft.functions.ScalableRank
        .withRunningSum(pop, Seq("g"), Seq(col("pk")), col("pop"), 32)
        .select(col("pk"), col("pop"), col("rsum").as("cum"),
          (col("rsum") - col("pop")).as("lo"))
      val tot = cum.agg(max(col("cum")).as("t"))
        .withColumn("band", greatest(expr("t div 512"), lit(1L)))
      val items = cum.crossJoin(broadcast(tot))
        .withColumn("b", explode(expr("sequence(lo div band, (cum - 1) div band)")))
        .select(col("pk"), col("lo"), col("cum"), col("b"))
      val probes = T.orders(s, d).select(col("o_custkey").as("cust")).distinct()
        .select(col("cust"), explode(expr("sequence(0, 7)")).as("slot"))
        .crossJoin(broadcast(tot))
        .withColumn("u", expr(
          """CAST(conv(substring(md5(concat(CAST(cust AS STRING), ':',
            |CAST(slot AS STRING))), 1, 10), 16, 10) AS BIGINT) % t + 1""".stripMargin))
        .withColumn("b", expr("(u - 1) div band"))
        .select(col("cust"), col("slot"), col("u"), col("b"))
      val drawn = probes.join(items, Seq("b"))
        .filter(col("u") > col("lo") && col("u") <= col("cum"))
        .select(col("cust"), col("slot"), col("pk"))
      val hist = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("hc"), col("l_partkey").as("hp"))
        .distinct()
      drawn.join(hist,
          col("cust") === col("hc") && col("pk") === col("hp"), "left_anti")
        .select(col("cust"), col("slot"), col("pk").as("neg_partkey"))
        .orderBy(col("cust"), col("slot"))
    })
  )

  /** Distinct co-occurrence pair counts over (ok, item) baskets with a
    * min-support floor: (a, b, n_ab, n_a, n_b), a < b. The self-join is
    * basket-keyed (co-partitioned, bounded by basket size² per basket);
    * item totals join back broadcast (vocabulary ≪ facts).
    */
  def basketPairCounts(items: DataFrame, minSupport: Long): DataFrame = {
    val itemCnt = items.groupBy(col("item")).agg(count(lit(1)).as("ni"))
    items.as("x")
      .join(items.as("y"), col("x.ok") === col("y.ok") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("a"), col("y.item").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .join(broadcast(itemCnt.select(col("item").as("a"), col("ni").as("n_a"))), Seq("a"))
      .join(broadcast(itemCnt.select(col("item").as("b"), col("ni").as("n_b"))), Seq("b"))
  }

  /** One FK edge of q154: (fk, n_child, n_orphans) as a 1-row frame.
    * n_child counts every child row; n_orphans counts non-null child
    * keys absent from the parent (NULL FK is valid, MATCH SIMPLE).
    */
  def fkEdgeAudit(name: String, child: DataFrame, ck: String,
                  parent: DataFrame, pk: String): DataFrame =
    child.select(col(ck).as("k")).filter(col("k").isNotNull)
      .join(parent.select(col(pk).as("p")).distinct(),
        col("k") === col("p"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .crossJoin(child.agg(count(lit(1)).as("n_child")))
      .select(lit(name).as("fk"), col("n_child"), col("n_orphans"))

  val oracle: Map[String, String] = Map(
    "q256_negative_sampling" ->
      """WITH pop AS (
        |  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS pop
        |  FROM lineitem GROUP BY 1
        |), cum0 AS (
        |  SELECT pk, pop,
        |         CAST(sum(pop) OVER (ORDER BY pk
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM pop
        |), cc AS (SELECT pk, pop, cum, cum - pop AS lo FROM cum0),
        |tot AS (
        |  SELECT max(cum) AS t, greatest(max(cum) // 512, CAST(1 AS BIGINT)) AS band
        |  FROM cum0
        |), items AS (
        |  SELECT pk, lo, cum,
        |         unnest(generate_series(lo // band, (cum - 1) // band)) AS b
        |  FROM cc CROSS JOIN tot
        |), probes AS (
        |  SELECT cust, slot,
        |         CAST(('0x' || substr(md5(CAST(cust AS VARCHAR) || ':' ||
        |           CAST(slot AS VARCHAR)), 1, 10)) AS BIGINT) % t + 1 AS u,
        |         band
        |  FROM (SELECT DISTINCT o_custkey AS cust FROM orders)
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS slot)
        |  CROSS JOIN tot
        |), pb AS (SELECT cust, slot, u, (u - 1) // band AS b FROM probes),
        |drawn AS (
        |  SELECT cust, slot, pk
        |  FROM pb JOIN items USING (b)
        |  WHERE u > lo AND u <= cum
        |), hist AS (
        |  SELECT DISTINCT o_custkey AS hc, l_partkey AS hp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |)
        |SELECT cust, slot, pk AS neg_partkey
        |FROM drawn
        |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hc = cust AND hp = pk)
        |ORDER BY cust, slot""".stripMargin,

    "q154_fk_audit" ->
      """SELECT 'events.user_id->customer' AS fk,
        |  (SELECT count(*) FROM events) AS n_child,
        |  (SELECT count(*) FROM events e
        |   WHERE e.user_id IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS n_orphans
        |UNION ALL
        |SELECT 'lineitem.l_orderkey->orders',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l
        |   WHERE l.l_orderkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l
        |   WHERE l.l_partkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l
        |   WHERE l.l_suppkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |ORDER BY fk""".stripMargin,

    "q10_join_inner" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q11_join_left" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_big_items
        |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) li
        |  ON o_orderkey = li.l_orderkey
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q12_join_right" ->
      """SELECT n_nationkey, n_name, count(c_custkey) AS n_rich
        |FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |RIGHT JOIN nation ON c.c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name
        |ORDER BY n_nationkey""".stripMargin,

    "q13_join_full" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey, acctbal, n_big_orders
        |FROM (SELECT c_custkey, round(c_acctbal,2) AS acctbal FROM customer WHERE c_acctbal < 0) a
        |FULL JOIN (SELECT o_custkey, count(*) AS n_big_orders FROM orders
        |           WHERE o_totalprice > 150000 GROUP BY o_custkey) b
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q14_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q15_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q16_join_cross" ->
      """SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
        |FROM region r1 CROSS JOIN region r2
        |ORDER BY r1_name, r2_name""".stripMargin,

    "q17_join_theta" ->
      """SELECT s_suppkey, count(*) AS n_richer_cust
        |FROM customer JOIN supplier ON c_acctbal > s_acctbal
        |GROUP BY s_suppkey
        |ORDER BY s_suppkey""".stripMargin,

    "q18_join_star" ->
      """SELECT r_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey  = o_orderkey
        |JOIN customer ON o_custkey   = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "q43_range_join_banded" ->
      """SELECT o_orderkey, count(*) AS n_shipments
        |FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_custkey <= 20) o
        |JOIN (SELECT l_shipdate FROM lineitem WHERE l_suppkey <= 3) l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q19_join_self" ->
      """SELECT a.o_custkey AS custkey, count(*) AS n_pairs
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        |GROUP BY a.o_custkey
        |ORDER BY custkey""".stripMargin,

    "q166_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
        |), nb AS (SELECT count(DISTINCT ok) AS nb FROM items),
        |ic AS (SELECT item, count(*) AS ni FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT x.item AS a, y.item AS b, count(*) AS n_ab
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.item < y.item
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |)
        |SELECT p.a, p.b, p.n_ab, ia.ni AS n_a, ib.ni AS n_b,
        |       (1000000 * p.n_ab) // nb.nb AS support_ppm,
        |       (1000000 * p.n_ab) // ia.ni AS conf_ppm,
        |       (1000 * p.n_ab * nb.nb) // (ia.ni * ib.ni) AS lift_milli
        |FROM pairs p
        |JOIN ic ia ON ia.item = p.a
        |JOIN ic ib ON ib.item = p.b
        |CROSS JOIN nb
        |ORDER BY p.a, p.b""".stripMargin,

    "q168_item_similarity" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
        |), ic AS (SELECT item, count(*) AS ni FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT x.item AS a, y.item AS b, count(*) AS n_ab
        |  FROM items x JOIN items y ON x.ok = y.ok AND x.item < y.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), pc AS (
        |  SELECT p.a, p.b, p.n_ab, ia.ni AS n_a, ib.ni AS n_b
        |  FROM pairs p JOIN ic ia ON ia.item = p.a JOIN ic ib ON ib.item = p.b
        |), sym AS (
        |  SELECT a, b, n_ab, n_a, n_b FROM pc
        |  UNION ALL
        |  SELECT b AS a, a AS b, n_ab, n_b AS n_a, n_a AS n_b FROM pc
        |), scored AS (
        |  SELECT a, b, n_ab,
        |         CAST(floor(1000000 * n_ab / sqrt(CAST(n_a * n_b AS DOUBLE))) AS BIGINT) AS cos_ppm
        |  FROM sym
        |), ranked AS (
        |  SELECT a, b, n_ab, cos_ppm,
        |         row_number() OVER (PARTITION BY a ORDER BY cos_ppm DESC, b) AS rnk
        |  FROM scored
        |)
        |SELECT a, rnk, b, n_ab, cos_ppm
        |FROM ranked WHERE rnk <= 3
        |ORDER BY a, rnk""".stripMargin,

    "q172_frequent_triples" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
        |), t AS (
        |  SELECT x.item AS a, y.item AS b, z.item AS c
        |  FROM items x
        |  JOIN items y ON x.ok = y.ok AND x.item < y.item
        |  JOIN items z ON x.ok = z.ok AND y.item < z.item
        |)
        |SELECT a, b, c, count(*) AS n_abc
        |FROM t GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY a, b, c""".stripMargin,

    "q179_join_skew_report" ->
      """WITH l AS (
        |  SELECT user_id AS k, count(*) AS nl FROM events GROUP BY 1
        |), r AS (
        |  SELECT o_custkey AS k, count(*) AS nr FROM orders GROUP BY 1
        |), m AS (
        |  SELECT l.k, l.nl, r.nr, l.nl * r.nr AS blowup
        |  FROM l JOIN r USING (k)
        |), t AS (SELECT CAST(sum(blowup) AS BIGINT) AS tot FROM m)
        |SELECT k, nl, nr, blowup,
        |       (10000 * blowup) // tot AS share_bp
        |FROM m CROSS JOIN t
        |ORDER BY blowup DESC, k
        |LIMIT 20""".stripMargin
  )
}
