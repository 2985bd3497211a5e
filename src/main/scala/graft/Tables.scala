package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Parquet-backed table catalog for the driver testdata
  * (/root/testdata/sf*, schemas in /root/repo/FIXTURES.md).
  *
  * This is the engine-side equivalent of the reference's single scan
  * operator (/root/reference/main.go:87-110): where the reference opens
  * one MySQL connection and streams one result set on one thread, here
  * every load is a distributed columnar scan that Catalyst can prune
  * (column pruning + predicate pushdown reach the parquet reader), so
  * the same logical "source" scales from 6k rows to 100 TB by adding
  * executors, not code.
  */
object T {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped under two different parquet footers across
    * testdata generations: TIMESTAMP(NANOS,false) (which Spark's
    * vectorized reader only loads as BIGINT under
    * spark.sql.legacy.parquet.nanosAsLong=true) and
    * TIMESTAMP(MICROS,false) (which loads as TIMESTAMP_NTZ under the
    * default NTZ inference). Branch on the loaded dtype so every
    * consumer sees a real TimestampType `ts` regardless of footer:
    * BIGINT → nanos→micros conversion; any temporal type → cast to
    * session-local timestamp (identity under the UTC session pin both
    * entrypoints and SparkSpec set).
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(load(s, d, "events"))

  /** The dtype branch itself, shared with the streaming path (a
    * readStream carries the same footer-dependent `ts` type and needs
    * the identical normalization — StreamingSpec's file-source test).
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Dimension tables that stay broadcast-sized at any realistic scale
    * factor (region: 5 rows, nation: 25 rows — fixed cardinality in
    * TPC-H-style data). Always broadcast them so star joins against the
    * fact tables never shuffle the big side on a dimension key.
    */
  def regionDim(s: SparkSession, d: String): DataFrame = broadcast(region(s, d))
  def nationDim(s: SparkSession, d: String): DataFrame = broadcast(nation(s, d))
}
