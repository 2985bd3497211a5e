package graft

import graft.functions.RangeJoin
import org.apache.spark.sql.functions._

/** Banded interval join must be row-for-row equivalent to the naive
  * theta join, independent of band width.
  */
class RangeJoinSpec extends SparkSpec {

  test("banded interval join equals the theta join at several band widths") {
    val o = T.orders(spark, sf001).filter(col("o_custkey") <= 10)
      .select(col("o_orderkey"), col("o_orderdate"),
              (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("o_end"))
    val l = T.lineitem(spark, sf001).filter(col("l_suppkey") <= 2)
      .select(col("l_shipdate"))
    val theta = l.join(o,
        col("l_shipdate") >= col("o_orderdate") && col("l_shipdate") <= col("o_end"))
      .select(col("o_orderkey"), col("l_shipdate"))
    for (band <- Seq(3600L, 7L * 24 * 3600, 90L * 24 * 3600)) {
      val banded = RangeJoin.bandedIntervalJoin(l, "l_shipdate", o, "o_orderdate", "o_end", band)
        .select(col("o_orderkey"), col("l_shipdate"))
      assert(banded.count() == theta.count(), s"count mismatch at band=$band")
      assert(theta.exceptAll(banded).count() == 0, s"missing rows at band=$band")
      assert(banded.exceptAll(theta).count() == 0, s"extra rows at band=$band")
    }
  }
}
