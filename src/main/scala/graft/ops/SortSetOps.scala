package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORDER BY / LIMIT / OFFSET and set-operation families.
  *
  * Scale posture: `orderBy(...).limit(n)` is planned by Spark as
  * TakeOrderedAndProject — a per-partition top-n followed by a top-n
  * merge on the driver, O(n) memory, no global sort. A bare global
  * ORDER BY range-partitions (sampled boundaries) and is reserved for
  * final result presentation. Set ops are shuffles on the full row; the
  * distinct variants add a hash-aggregate — same cost envelope as
  * groupBy at 100 TB.
  */
object SortSetOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ORDER BY ... LIMIT → TakeOrderedAndProject (top-n, not full sort).
    "q40_order_limit" -> ((s, d) =>
      T.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))),

    // LIMIT with OFFSET (Spark ≥3.4 df.offset).
    "q41_offset" -> ((s, d) =>
      T.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(20)
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))),

    // Multi-key mixed-direction global sort with explicit null placement.
    "q42_multikey_sort" -> ((s, d) =>
      T.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"), col("c_custkey"),
                round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("c_mktsegment").asc, col("acctbal").desc, col("c_custkey").asc)),

    // UNION ALL (bag union, by position — MySQL's default surface).
    "q45_union_all" -> ((s, d) => {
      val c = T.customer(s, d).select(col("c_nationkey").as("nk"), lit("customer").as("src"))
      val p = T.supplier(s, d).select(col("s_nationkey").as("nk"), lit("supplier").as("src"))
      c.union(p).orderBy(col("nk"), col("src"))
    }),

    // UNION DISTINCT.
    "q46_union_distinct" -> ((s, d) => {
      val c = T.customer(s, d).select(col("c_nationkey").as("nk"))
      val p = T.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.union(p).distinct().orderBy(col("nk"))
    }),

    // INTERSECT (distinct semantics, as in SQL).
    "q47_intersect" -> ((s, d) => {
      val c = T.customer(s, d).select(col("c_nationkey").as("nk"))
      val p = T.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.intersect(p).orderBy(col("nk"))
    }),

    // EXCEPT (distinct semantics).
    "q48_except" -> ((s, d) => {
      val c = T.customer(s, d).select(col("c_nationkey").as("nk"))
      val p = T.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.except(p).orderBy(col("nk"))
    }),

    // EXCEPT ALL / INTERSECT ALL — bag semantics (MySQL 8.0.31+ surface).
    "q49_except_all" -> ((s, d) => {
      val a = T.orders(s, d).filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("ck"))
      val b = T.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("ck"))
      a.exceptAll(b).orderBy(col("ck"))
    }),

    // UNPIVOT (melt): wide numeric columns to (attr, val) rows — the
    // inverse of pivot, a pure projection+generate (no shuffle beyond
    // the presentation sort). Spark's Dataset.unpivot; the oracle uses
    // the engine-neutral UNION ALL expansion.
    "q38_unpivot" -> ((s, d) =>
      T.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
                round(col("p_retailprice"), 2).as("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
                 Array(col("p_size"), col("p_retailprice")), "attr", "val")
        .orderBy(col("p_partkey"), col("attr"))),

    // INTERSECT ALL: each ck kept min(count_a, count_b) times.
    "q44_intersect_all" -> ((s, d) => {
      val a = T.orders(s, d).filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("ck"))
      val b = T.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("ck"))
      a.intersectAll(b).orderBy(col("ck"))
    }),

    // Keyset pagination — the 100 TB replacement for OFFSET (q41):
    // OFFSET n scans and discards n rows per page, so deep pages cost
    // O(page·n); a keyset cursor turns the same page fetch into a
    // PUSHED-DOWN range predicate + TakeOrderedAndProject — row groups
    // before the cursor never leave the scan (PlanAuditSpec pins both
    // the pushed filter and the top-k plan). The cursor is the last
    // row of the previous page under the total order
    // (o_totalprice DESC, o_orderkey).
    "q155_keyset_page" -> ((s, d) =>
      T.orders(s, d)
        .filter(col("o_totalprice") < 150000.0 ||
          (col("o_totalprice") === 150000.0 && col("o_orderkey") > 0))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))),

    // Z-order (Morton) clustering — the multi-dimensional LAYOUT sort
    // behind Delta/Iceberg OPTIMIZE ZORDER: writing in z order gives
    // every parquet row group a bounded min/max envelope on BOTH
    // dimensions, so scans filtering on EITHER column prune row groups
    // (a single-column sort prunes only its own column). Buckets are
    // exact integer scalings (256 bins via DIV against in-plan
    // broadcast maxima, q101's discipline), the interleave is pure bit
    // arithmetic — both engines replay z bit-exactly. The sort itself
    // is Spark's sampled range partitioning: the 100 TB write path is
    // repartitionByRange(z) + sortWithinPartitions(z), no single-task
    // stage. ZOrderSpec proves the pruning claim: on a full 256×256
    // grid every 256-row chunk of the z order is a 16×16 tile (span 15
    // on both dims), where a one-dim sort leaves the other dim at full
    // 255 span.
    "q151_zorder_layout" -> ((s, d) => {
      val o = T.orders(s, d)
        .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      val maxes = o.agg(max(col("o_custkey")).as("mc"), max(col("cents")).as("mp"))
      o.crossJoin(broadcast(maxes))
        .select(col("o_orderkey"),
          expr("(o_custkey * 256) DIV (mc + 1)").as("b_cust"),
          expr("(cents * 256) DIV (mp + 1)").as("b_price"))
        .withColumn("z", mortonInterleave(col("b_cust"), col("b_price")))
        .orderBy(col("z"), col("o_orderkey"))
    }),

    // Partition-layout advisor — the dry run behind every partitionBy
    // decision (q151's sibling: that optimizes WITHIN files, this
    // audits the directory layout itself): for each candidate key set,
    // the partition count, row envelope, skew ratio (max/avg in basis
    // points — the straggler predictor), and the small-partition count
    // (under 10% of average — the small-files problem a 100 TB writer
    // must not create). Each candidate is one partial-aggregable
    // count + a broadcast-totals rollup; the table never shuffles on
    // anything but the candidate key.
    "q240_partition_advisor" -> ((s, d) => {
      val docs = T.documents(s, d)
      def profile(keys: Seq[String], name: String) = {
        val parts = docs.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        val tot = parts.agg(count(lit(1)).as("np"), sum(col("n")).as("nr"))
        // rows·partitions products widen to DECIMAL(38,0) (the
        // q248/q166 overflow class): max_rows·np can pass int64 once
        // rows ~1e12 meet np ~1e4, while skew_bp itself stays ≤ 1e4·np
        parts.crossJoin(broadcast(tot))
          .groupBy(col("np"), col("nr"))
          .agg(min(col("n")).as("min_rows"), max(col("n")).as("max_rows"),
            sum(when(expr("CAST(n AS DECIMAL(38,0)) * np * 10") < col("nr"),
              1L).otherwise(0L)).as("n_small"))
          .select(lit(name).as("layout"),
            col("np").as("n_partitions"), col("nr").as("n_rows"),
            col("min_rows"), col("max_rows"),
            expr("(CAST(10000 AS DECIMAL(38,0)) * max_rows * np) div nr")
              .as("skew_bp"),
            col("n_small"))
      }
      profile(Seq("lang"), "lang")
        .unionByName(profile(Seq("source"), "source"))
        .unionByName(profile(Seq("lang", "source"), "lang,source"))
        .orderBy(col("layout"))
    })
  )

  /** Morton interleave of two 8-bit buckets (z = y7x7…y1x1y0x0) via the
    * standard bit-spreading ladder — pure codegen'd integer ops, no UDF.
    */
  def mortonInterleave(bx: org.apache.spark.sql.Column,
                       by: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread8(c: org.apache.spark.sql.Column) = {
      val s1 = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0FL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x3333L))
      (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x5555L))
    }
    spread8(bx).bitwiseOR(shiftleft(spread8(by), 1))
  }

  val oracle: Map[String, String] = Map(
    "q240_partition_advisor" ->
      """WITH p1 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |t1 AS (SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(n) AS BIGINT) AS nr FROM p1),
        |r1 AS (SELECT 'lang' AS layout, t1.np AS n_partitions, t1.nr AS n_rows,
        |              min(n) AS min_rows, max(n) AS max_rows,
        |              (10000 * max(n) * t1.np) // t1.nr AS skew_bp,
        |              CAST(sum(CASE WHEN n * t1.np * 10 < t1.nr THEN 1 ELSE 0 END) AS BIGINT) AS n_small
        |       FROM p1 CROSS JOIN t1 GROUP BY t1.np, t1.nr),
        |p2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |t2 AS (SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(n) AS BIGINT) AS nr FROM p2),
        |r2 AS (SELECT 'source' AS layout, t2.np AS n_partitions, t2.nr AS n_rows,
        |              min(n) AS min_rows, max(n) AS max_rows,
        |              (10000 * max(n) * t2.np) // t2.nr AS skew_bp,
        |              CAST(sum(CASE WHEN n * t2.np * 10 < t2.nr THEN 1 ELSE 0 END) AS BIGINT) AS n_small
        |       FROM p2 CROSS JOIN t2 GROUP BY t2.np, t2.nr),
        |p3 AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2),
        |t3 AS (SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(n) AS BIGINT) AS nr FROM p3),
        |r3 AS (SELECT 'lang,source' AS layout, t3.np AS n_partitions, t3.nr AS n_rows,
        |              min(n) AS min_rows, max(n) AS max_rows,
        |              (10000 * max(n) * t3.np) // t3.nr AS skew_bp,
        |              CAST(sum(CASE WHEN n * t3.np * 10 < t3.nr THEN 1 ELSE 0 END) AS BIGINT) AS n_small
        |       FROM p3 CROSS JOIN t3 GROUP BY t3.np, t3.nr)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |ORDER BY layout""".stripMargin,

    "q155_keyset_page" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |WHERE o_totalprice < 150000 OR (o_totalprice = 150000 AND o_orderkey > 0)
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q151_zorder_layout" ->
      """WITH m AS (
        |  SELECT max(o_custkey) AS mc,
        |         max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mp
        |  FROM orders
        |), b AS (
        |  SELECT o_orderkey,
        |         (o_custkey * 256) // (mc + 1) AS b_cust,
        |         (CAST(round(o_totalprice * 100) AS BIGINT) * 256) // (mp + 1) AS b_price
        |  FROM orders, m
        |), s1 AS (
        |  SELECT o_orderkey, b_cust, b_price,
        |         ((b_cust | (b_cust << 4)) & 3855) AS x1,
        |         ((b_price | (b_price << 4)) & 3855) AS y1
        |  FROM b
        |), s2 AS (
        |  SELECT o_orderkey, b_cust, b_price,
        |         ((x1 | (x1 << 2)) & 13107) AS x2,
        |         ((y1 | (y1 << 2)) & 13107) AS y2
        |  FROM s1
        |), s3 AS (
        |  SELECT o_orderkey, b_cust, b_price,
        |         ((x2 | (x2 << 1)) & 21845) AS x3,
        |         ((y2 | (y2 << 1)) & 21845) AS y3
        |  FROM s2
        |)
        |SELECT o_orderkey, b_cust, b_price,
        |       CAST(x3 | (y3 << 1) AS BIGINT) AS z
        |FROM s3 ORDER BY z, o_orderkey""".stripMargin,

    "q40_order_limit" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q41_offset" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""".stripMargin,

    "q42_multikey_sort" ->
      """SELECT c_mktsegment, c_nationkey, c_custkey, round(c_acctbal,2) AS acctbal
        |FROM customer
        |ORDER BY c_mktsegment ASC, round(c_acctbal,2) DESC, c_custkey ASC""".stripMargin,

    "q45_union_all" ->
      """SELECT c_nationkey AS nk, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_nationkey AS nk, 'supplier' AS src FROM supplier
        |ORDER BY nk, src""".stripMargin,

    "q46_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q47_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q48_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q49_except_all" ->
      """SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 100000
        |EXCEPT ALL
        |SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY ck""".stripMargin,

    "q44_intersect_all" ->
      """SELECT o_custkey AS ck FROM orders WHERE o_totalprice > 100000
        |INTERSECT ALL
        |SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY ck""".stripMargin,

    "q38_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, round(p_retailprice, 2) AS val FROM part
        |ORDER BY p_partkey, attr""".stripMargin
  )
}
