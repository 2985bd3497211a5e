package graft

import graft.ops.SortSetOps.mortonInterleave
import org.apache.spark.sql.functions._

/** The pruning claim behind q151: on a full 256×256 bucket grid, every
  * 256-row chunk of the z order is a 16×16 tile — bounded min/max
  * envelopes on BOTH dimensions — while a one-dimensional sort leaves
  * the other dimension at full span. This is exactly what parquet
  * row-group min/max stats see after a clustered write.
  */
class ZOrderSpec extends SparkSpec {

  test("morton interleave is a bijection 256×256 → 0..65535 and orders by bit interleaving") {
    import spark.implicits._
    val grid = (0 until 65536).map(i => (i.toLong, (i % 256).toLong, (i / 256).toLong))
      .toDF("id", "bx", "by")
      .withColumn("z", mortonInterleave(col("bx"), col("by")))
    val stats = grid.agg(
      countDistinct(col("z")).as("nd"), min(col("z")).as("mn"), max(col("z")).as("mx"))
      .as[(Long, Long, Long)].head()
    assert(stats == ((65536L, 0L, 65535L)))
    // spot-check the bit pattern: (x=3, y=5) → 3=0b011, 5=0b101 →
    // z = y2x2 y1x1 y0x0 = 0b100111 = 39
    val z35 = grid.filter(col("bx") === 3 && col("by") === 5)
      .select("z").as[Long].head()
    assert(z35 == 39L)
  }

  test("every 256-row z chunk is a 16×16 tile; a one-dim sort leaves the other dim at full span (q151)") {
    import spark.implicits._
    val grid = (0 until 65536).map(i => ((i % 256).toLong, (i / 256).toLong))
      .toDF("bx", "by")
      .withColumn("z", mortonInterleave(col("bx"), col("by")))
    // z is a bijection on the full grid, so chunk = z DIV 256 is the
    // 256-consecutive-rows chunking of the z-sorted layout.
    val spans = grid.groupBy(expr("z div 256").as("chunk"))
      .agg((max(col("bx")) - min(col("bx"))).as("sx"),
           (max(col("by")) - min(col("by"))).as("sy"))
      .agg(max(col("sx")).as("wx"), max(col("sy")).as("wy"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].head()
    assert(spans == ((15L, 15L, 256L)),
      s"each of the 256 z chunks must be a 16×16 tile, got $spans")
    // Baseline: chunking the bx-sorted layout (chunk = bx) bounds bx
    // to a single value but leaves by at the full 255 span.
    val oneDim = grid.groupBy(col("bx"))
      .agg((max(col("by")) - min(col("by"))).as("sy"))
      .agg(min(col("sy"))).as[Long].head()
    assert(oneDim == 255L)
  }
}
