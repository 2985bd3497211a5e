package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: writing both join sides bucketed
  * on the join key lets the sort-merge join run WITHOUT any Exchange —
  * the co-located-join scale technique claimed in DESIGN.md, proven
  * here against the physical plan.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with no Exchange in the plan") {
    // (warehouse dir is a static config — the default ./spark-warehouse
    // is used; managed tables are dropped, and the dir is gitignored)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    T.lineitem(spark, sf001)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    T.orders(spark, sf001)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // force the shuffle-join path so the assertion is about bucketing,
    // not about broadcast sidestepping the question
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      val expected = T.lineitem(spark, sf001).join(
        T.orders(spark, sf001),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
