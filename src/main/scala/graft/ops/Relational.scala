package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / filter / distinct / conditional operators.
  *
  * In the reference every one of these is delegated to MySQL through the
  * opaque query passthrough (/root/reference/main.go:106); here they are
  * declarative DataFrame plans so Catalyst pushes the predicates and the
  * column pruning all the way into the parquet scan (visible as
  * PushedFilters / ReadSchema in .explain), which is what makes the same
  * query viable on a 100 TB table: the scan only reads the referenced
  * columns and skips row groups via min/max stats.
  *
  * Determinism contract (FIXTURES.md): every oracle-checked query ends in
  * a total ORDER BY and rounds floating aggregates.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Engine-neutral SQL (identical text runs on Spark SQL and DuckDB).
    * Correlated scalar subquery — Catalyst decorrelates it into a left
    * outer aggregate-join (RewriteCorrelatedScalarSubquery), so the
    * 100 TB plan is one shuffle, not N probes.
    */
  private val scalarSubquerySql =
    """SELECT c_custkey, c_name,
      | round((SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey), 2) AS max_order
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** IN-subquery — planned as a left semi join. */
  private val inSubquerySql =
    """SELECT o_orderkey, o_custkey
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      |  AND o_totalprice > 150000
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped pricing summary: the flagship scan→filter→agg→sort
    // slice (SURVEY.md §7.2). Partial aggregation (map-side combine) is
    // automatic in Spark's hash aggregate, so the shuffle carries one row
    // per (flag,status,partition), not 100 TB of lineitems.
    "q01_pricing_summary" -> ((s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // WHERE-clause surface: comparison, BETWEEN, IN, LIKE, AND/OR/NOT.
    // All predicates are parquet-pushable (no UDFs in the filter).
    "q02_filter_predicates" -> ((s, d) =>
      T.orders(s, d)
        .filter(
          col("o_totalprice").between(50000, 200000) &&
          col("o_orderstatus").isin("F", "O") &&
          col("o_orderpriority").like("1%") &&
          !(col("o_custkey") % 10 === 0))
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // DISTINCT projection — a shuffle on the projected columns only.
    "q03_distinct" -> ((s, d) =>
      T.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey"))),

    // CASE WHEN bucketing + aggregation over the derived column.
    "q04_case_when" -> ((s, d) =>
      T.orders(s, d)
        .select(
          col("o_orderstatus"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high").as("price_band"))
        .groupBy(col("o_orderstatus"), col("price_band"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("price_band"))),

    // IS NULL / null-safe predicate surface, exercised through an outer
    // join that actually produces nulls (the base tables are complete).
    "q05_null_predicates" -> ((s, d) => {
      val bigOrders = T.orders(s, d).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey"), col("o_orderkey"))
      T.customer(s, d)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_outer")
        .filter(col("o_orderkey").isNull)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Correlated scalar subquery (shared SQL text = its own oracle).
    "q06_scalar_subquery" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(scalarSubquerySql)
    }),

    // IN (subquery) semi-join form.
    "q07_in_subquery" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer")
      T.orders(s, d).createOrReplaceTempView("orders")
      s.sql(inSubquerySql)
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders
        |WHERE o_totalprice BETWEEN 50000 AND 200000
        |  AND o_orderstatus IN ('F','O')
        |  AND o_orderpriority LIKE '1%'
        |  AND NOT (o_custkey % 10 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "q03_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q04_case_when" ->
      """SELECT o_orderstatus,
        | CASE WHEN o_totalprice < 50000 THEN 'low'
        |      WHEN o_totalprice < 150000 THEN 'mid'
        |      ELSE 'high' END AS price_band,
        | count(*) AS n
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY o_orderstatus, price_band""".stripMargin,

    "q05_null_predicates" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 150000) b
        |  ON c_custkey = b.o_custkey
        |WHERE b.o_orderkey IS NULL
        |ORDER BY c_custkey""".stripMargin,

    "q06_scalar_subquery" -> scalarSubquerySql,
    "q07_in_subquery" -> inSubquerySql
  )
}
