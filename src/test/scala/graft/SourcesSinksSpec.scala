package graft

import org.apache.spark.sql.functions._

/** Source/sink formats beyond the reference's MySQL-in/parquet-out pair
  * (SURVEY §2.2: "CSV/JSON/ORC come free via DataFrameReader/Writer") —
  * prove the claim with round-trips, and exercise the streaming parquet
  * sink with a checkpoint (the durable end of a streaming pipeline).
  */
class SourcesSinksSpec extends SparkSpec {

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempDirectory("snk").toString + "/" + suffix

  test("csv round-trip preserves rows (schema via header+inference)") {
    val src = T.customer(spark, sf001)
    val out = tmp("csv")
    src.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
  }

  test("json round-trip preserves rows and values") {
    val src = T.nation(spark, sf001)
    val out = tmp("json")
    src.write.json(out)
    val back = spark.read.json(out)
    assert(back.count() == src.count())
    val origSum = src.agg(sum("n_nationkey")).collect()(0).getLong(0)
    val backSum = back.agg(sum("n_nationkey")).collect()(0).getLong(0)
    assert(origSum == backSum)
  }

  test("orc round-trip preserves schema exactly") {
    val src = T.supplier(spark, sf001)
    val out = tmp("orc")
    src.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
  }

  test("streaming parquet sink with checkpoint writes the full input") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps.Ev
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val evs = (1 to 50).map(i =>
      Ev(i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), i % 5,
         "click", i.toDouble))
    mem.addData(evs: _*)
    val out = tmp("stream_parquet")
    val q = mem.toDF().writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("ckpt"))
      .outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(out).count() == 50)
  }
}
