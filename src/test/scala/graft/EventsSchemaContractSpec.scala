package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Schema contract for `T.events` (Tables.scala).
  *
  * The driver's testdata generator has shipped `events.ts` under two
  * different parquet footers across generations — TIMESTAMP(NANOS,false)
  * (rounds 1-5) and TIMESTAMP(MICROS,false) (round 6+) — and a silent
  * change broke 26 catalog queries once. This spec writes tiny fixtures
  * with each footer the loader claims to support and asserts they all
  * load to the SAME TimestampType rows, so the next regeneration
  * (MILLIS? tz-adjusted?) fails here with a clear message instead of in
  * 26 oracle rows.
  */
class EventsSchemaContractSpec extends SparkSpec {

  // One instant, expressed in each footer's physical unit.
  private val instantMicros = 1704067200000000L // 2024-01-01T00:00:00Z

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"events-contract-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Writes $dir/events.parquet with an INT64 ts annotated
    * TIMESTAMP(NANOS, isAdjustedToUTC=false) via parquet-mr directly —
    * Spark cannot author this footer itself, which is exactly why the
    * nanosAsLong escape hatch exists on the read side.
    */
  private def writeNanosFixture(dir: String): Unit = {
    val schema = Types
      .buildMessage()
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(PrimitiveTypeName.INT64)
      .named("user_id")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    try {
      writer.write(f.newGroup().append("ts", instantMicros * 1000L).append("user_id", 1L))
      writer.write(f.newGroup().append("ts", (instantMicros + 1000000L) * 1000L).append("user_id", 2L))
    } finally writer.close()
  }

  /** Writes $dir/events.parquet from Spark with the given ts type:
    * TimestampNTZType → TIMESTAMP(MICROS, isAdjustedToUTC=false) (the
    * round-6+ generator footer); TimestampType → MICROS adjusted-to-UTC.
    */
  private def writeSparkFixture(dir: String, tsType: DataType): Unit = {
    val rows = Seq(
      Row(java.time.LocalDateTime.ofEpochSecond(instantMicros / 1000000L, 0, java.time.ZoneOffset.UTC), 1L),
      Row(java.time.LocalDateTime.ofEpochSecond(instantMicros / 1000000L + 1, 0, java.time.ZoneOffset.UTC), 2L)
    )
    val cast = tsType match {
      case TimestampNTZType => rows
      case _ =>
        rows.map(r =>
          Row(java.sql.Timestamp.from(r.getAs[java.time.LocalDateTime](0).toInstant(java.time.ZoneOffset.UTC)), r.get(1))
        )
    }
    val schema = StructType(Seq(StructField("ts", tsType), StructField("user_id", LongType)))
    spark
      .createDataFrame(spark.sparkContext.parallelize(cast, 1), schema)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
  }

  private def loadedTs(dir: String): Seq[java.sql.Timestamp] = {
    val df = T.events(spark, dir)
    assert(
      df.schema("ts").dataType == TimestampType,
      s"T.events must present ts as TimestampType; got ${df.schema("ts").dataType} — " +
        "the testdata footer changed again: extend the dtype branch in Tables.scala"
    )
    df.select("ts").collect().map(_.getTimestamp(0)).toSeq.sortBy(_.getTime)
  }

  test("NANOS footer (rounds 1-5 generator) loads as BIGINT under nanosAsLong and converts") {
    val d = tmpDir("nanos")
    writeNanosFixture(d)
    val raw = spark.read.parquet(s"$d/events.parquet")
    assert(raw.schema("ts").dataType == LongType, "precondition: NANOS+nanosAsLong loads as BIGINT")
    assert(loadedTs(d).head.getTime == instantMicros / 1000L)
  }

  test("MICROS NTZ footer (round 6+ generator) loads as TIMESTAMP_NTZ and casts") {
    val d = tmpDir("ntz")
    writeSparkFixture(d, TimestampNTZType)
    val raw = spark.read.parquet(s"$d/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType, "precondition: MICROS NTZ infers TIMESTAMP_NTZ")
    assert(loadedTs(d).head.getTime == instantMicros / 1000L)
  }

  test("MICROS adjusted-to-UTC footer passes through unchanged") {
    val d = tmpDir("ltz")
    writeSparkFixture(d, TimestampType)
    assert(loadedTs(d).head.getTime == instantMicros / 1000L)
  }

  test("all supported footers load to identical instants") {
    val dn = tmpDir("eq-nanos"); writeNanosFixture(dn)
    val dz = tmpDir("eq-ntz"); writeSparkFixture(dz, TimestampNTZType)
    val dl = tmpDir("eq-ltz"); writeSparkFixture(dl, TimestampType)
    assert(loadedTs(dn) == loadedTs(dz))
    assert(loadedTs(dz) == loadedTs(dl))
  }

  test("driver testdata loads with a TimestampType ts in the expected range") {
    val df = T.events(spark, sf001)
    assert(df.schema("ts").dataType == TimestampType)
    val (lo, hi) = (java.sql.Timestamp.valueOf("2023-12-31 00:00:00"), java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val cnt = df.filter(org.apache.spark.sql.functions.col("ts").between(lo, hi)).count()
    assert(cnt == df.count(), "events.ts outside the documented 2024-01 window — testdata contract changed")
  }
}
