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

  test("property: banded ≡ theta on generated intervals (100 random cases folded into one frame)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val points = (1 to 300).map(i => (i.toLong, ts(rnd.nextInt(100000)))).toDF("p_id", "pt")
    val intervals = (1 to 100).map { i =>
      val st = rnd.nextInt(100000); (i.toLong, ts(st), ts(st + rnd.nextInt(20000)))
    }.toDF("i_id", "st", "en")
    val theta = points.join(intervals, col("pt") >= col("st") && col("pt") <= col("en"))
      .select("p_id", "i_id")
    val banded = graft.functions.RangeJoin
      .bandedIntervalJoin(points, "pt", intervals, "st", "en", bandSeconds = 5000)
      .select("p_id", "i_id")
    assert(theta.count() == banded.count())
    assert(theta.exceptAll(banded).count() == 0)
    assert(banded.exceptAll(theta).count() == 0)
  }
}
