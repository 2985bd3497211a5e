package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Pins the loaded schema of EVERY driver table, the way
  * EventsSchemaContractSpec pins the two historical events footers: the
  * round-6 testdata regeneration silently retyped one column and broke
  * 26 oracle rows at once — this spec turns the next regeneration
  * (float→double embeddings? int32→int64 keys? renamed columns?) into
  * ONE unit-test failure that names the table and column, instead of a
  * wall of red oracle rows with no obvious root cause.
  */
class TablesSchemaContractSpec extends SparkSpec {

  private def schemaOf(df: DataFrame): Seq[(String, DataType)] =
    df.schema.fields.map(f => f.name -> f.dataType).toSeq

  private val d = sf001

  test("star-schema tables load with the contracted columns and types") {
    assert(schemaOf(T.region(spark, d)) ===
      Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(schemaOf(T.nation(spark, d)) ===
      Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
          "n_regionkey" -> IntegerType))
    assert(schemaOf(T.customer(spark, d)) ===
      Seq("c_custkey" -> LongType, "c_name" -> StringType,
          "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
          "c_mktsegment" -> StringType))
    assert(schemaOf(T.supplier(spark, d)) ===
      Seq("s_suppkey" -> LongType, "s_name" -> StringType,
          "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(schemaOf(T.part(spark, d)) ===
      Seq("p_partkey" -> LongType, "p_name" -> StringType,
          "p_brand" -> StringType, "p_type" -> StringType,
          "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assert(schemaOf(T.orders(spark, d)) ===
      Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
          "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
          "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    assert(schemaOf(T.lineitem(spark, d)) ===
      Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
          "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
          "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
          "l_discount" -> DoubleType, "l_tax" -> DoubleType,
          "l_returnflag" -> StringType, "l_linestatus" -> StringType,
          "l_shipdate" -> TimestampNTZType))
  }

  test("extension tables load with the contracted columns and types") {
    // events.ts arrives as whatever the current footer says —
    // T.normalizeEventsTs must present TimestampType regardless
    // (EventsSchemaContractSpec covers both historical footers; this
    // pins the rest of the row)
    assert(schemaOf(T.events(spark, d)) ===
      Seq("event_id" -> LongType, "ts" -> TimestampType,
          "user_id" -> LongType, "event_type" -> StringType,
          "value" -> DoubleType, "props" -> StringType))
    assert(schemaOf(T.documents(spark, d)) ===
      Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
          "source" -> StringType, "n_chars" -> LongType))
    assert(schemaOf(T.embeddings(spark, d)) ===
      Seq("vec_id" -> LongType,
          "embedding" -> ArrayType(FloatType, containsNull = true),
          "label" -> IntegerType))
  }
}
