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

  test("avro round-trip preserves values, logical types, and honors a codec") {
    // the Avro implementation ships inside this build's spark-sql jar
    // but without the short-name service registration (Spark's lookup
    // special-cases the bare "avro" string into a deploy-the-module
    // error) — the fully-qualified provider resolves it directly
    val avro = "org.apache.spark.sql.avro.AvroFileFormat"
    val src = T.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    val out = tmp("avro")
    src.write.format(avro).option("compression", "snappy").save(out)
    val back = spark.read.format(avro).load(out)
    assert(back.count() == src.count())
    assert(back.schema("o_orderdate").dataType === src.schema("o_orderdate").dataType)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum("o_orderkey")).collect()(0).getLong(0)
    assert(key(back) === key(src))
    // values survive bit-for-bit: anti-join both ways is empty
    assert(back.exceptAll(src).count() === 0L && src.exceptAll(back).count() === 0L)
  }

  test("partitionBy write creates hive-style dirs and reads prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("part-prune").toString
    T.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    // hive-style layout on disk
    val subdirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName)
    assert(subdirs.exists(_.startsWith("event_type=")), s"no partition dirs: ${subdirs.toSeq}")
    // a filter on the partition column must prune at planning time:
    // the scan shows it under PartitionFilters, NOT as a data filter,
    // and only the matching directory's files are read.
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("event_type"),
      "partition filter did not reach the scan as a partition filter")
    val expected = T.events(spark, sf001).filter(col("event_type") === "click").count()
    assert(read.count() === expected)
  }

  test("parquet writes honor an explicit compression codec") {
    val dir = java.nio.file.Files.createTempDirectory("codec").toString
    T.nation(spark, sf001).write.mode("overwrite")
      .option("compression", "zstd").parquet(dir)
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")), s"no zstd files: ${files.toSeq}")
    assert(spark.read.parquet(dir).count() === T.nation(spark, sf001).count())
  }

  test("mergeSchema read unifies evolved parquet schemas") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    val v1 = T.nation(spark, sf001).select(col("n_nationkey"), col("n_name"))
    val v2 = T.nation(spark, sf001)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    v1.write.parquet(s"$dir/p=1")
    v2.write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("n_nationkey", "n_name", "n_regionkey", "p"))
    // rows written before the column existed surface it as NULL
    val olds = merged.filter(col("p") === 1)
    assert(olds.filter(col("n_regionkey").isNull).count() === olds.count())
  }

  test("catalog managed table: saveAsTable + insertInto + spark.table round-trip") {
    val base = T.nation(spark, sf001).select("n_nationkey", "n_name")
    // overwrite + finally-drop so a crashed earlier run's stale
    // warehouse dir can't poison this one
    try {
      base.write.mode("overwrite").saveAsTable("graft_cat_nation")
      assert(spark.table("graft_cat_nation").count() === base.count())
      // append through the catalog, not a path
      base.limit(3).write.insertInto("graft_cat_nation")
      assert(spark.table("graft_cat_nation").count() === base.count() + 3)
      assert(spark.catalog.tableExists("graft_cat_nation"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cat_nation")
    }
    assert(!spark.catalog.tableExists("graft_cat_nation"))
  }

  test("foreachBatch sink runs arbitrary batch logic per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps.Ev
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = tmp("febatch")
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // arbitrary per-batch logic: aggregate then append — the escape
        // hatch for sinks Structured Streaming lacks natively
        batch.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", tmp("febatch_ckpt"))
      .start()
    mem.addData(Ev(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1, "click", 1.0),
                Ev(2, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1, "view", 2.0))
    q.processAllAvailable()
    mem.addData(Ev(3, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2, "click", 3.0))
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(out)
    assert(back.agg(sum("n")).collect()(0).getLong(0) == 3)
    assert(back.select("batch_id").distinct().count() == 2)
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
