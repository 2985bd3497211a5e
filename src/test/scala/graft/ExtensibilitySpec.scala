package graft

import graft.functions.Extensibility
import org.apache.spark.sql.functions._

/** UDF/UDAF surface + approximate-aggregate accuracy guarantees that
  * the SQL oracle can't express.
  */
class ExtensibilitySpec extends SparkSpec {

  test("SignatureMin aggregator folds element-wise minimum over groups") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(5L, 1L, 9L)),
      ("a", Seq(3L, 4L, 2L)),
      ("b", Seq(7L, 7L, 7L))).toDF("k", "sig")
    val out = df.groupBy($"k")
      .agg(Extensibility.signatureMin(3)($"sig").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(3L, 1L, 2L))
    assert(out("b") == Seq(7L, 7L, 7L))
  }

  test("udaf merge is associative across partitions") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("g", Seq(i.toLong, (101 - i).toLong)))
    val one = rows.toDF("k", "sig").repartition(1)
    val many = rows.toDF("k", "sig").repartition(7)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(Extensibility.signatureMin(2)($"sig")).collect()(0).getSeq[Long](1)
    assert(agg(one) == agg(many))
    assert(agg(one) == Seq(1L, 1L))
  }

  test("aggState merge equals from-scratch aggregation for ANY split, and chains across batches (q148)") {
    import spark.implicits._
    import graft.ops.Aggregates.{aggState, mergeAggStates}
    val rows = (1 to 500).map(i => (s"k${i % 37}", (i * 31 % 113).toDouble))
    val df = rows.toDF("k", "x")
    val full = aggState(df, "k", "x")
      .orderBy("k").collect().map(_.toSeq).toSeq
    // 3-way arbitrary split, merged pairwise THEN with the third —
    // associativity is what lets a nightly job fold batch after batch.
    val (a, b, c) = (df.filter($"x" < 30), df.filter($"x" >= 30 && $"x" < 80), df.filter($"x" >= 80))
    val chained = mergeAggStates("k",
      mergeAggStates("k", aggState(a, "k", "x"), aggState(b, "k", "x")),
      aggState(c, "k", "x"))
    assert(chained.orderBy("k").collect().map(_.toSeq).toSeq == full)
    // Distinct-count state merges the same way via Spark's HLL sketch
    // functions (DataSketches): union-of-sketches == whole-data sketch,
    // EXACTLY (the sketch union is deterministic), not just within ε.
    val sk = (d: org.apache.spark.sql.DataFrame) =>
      d.groupBy($"k").agg(expr("hll_sketch_agg(CAST(x AS BIGINT))").as("sk"))
    val merged = sk(a).unionByName(sk(b)).unionByName(sk(c))
      .groupBy($"k").agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("nd"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    val whole = df.groupBy($"k").agg(expr("hll_sketch_estimate(hll_sketch_agg(CAST(x AS BIGINT)))").as("nd"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(merged == whole)
  }

  test("slugify scalar udf registers and runs through Spark SQL") {
    Extensibility.register(spark)
    val got = spark.sql("SELECT slugify('  Hello, World! 42 ') AS s").collect()(0).getString(0)
    assert(got == "hello-world-42")
    assert(spark.sql("SELECT slugify(NULL) AS s").collect()(0).isNullAt(0))
  }

  test("approx_count_distinct is within 5% of exact (the 100 TB count-distinct path)") {
    val li = T.lineitem(spark, sf001)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile lands within rank tolerance of exact (the 100 TB percentile path)") {
    // The scale twin of q29's exact percentile (Aggregates.scala):
    // approx_percentile's sketch is single-pass and mergeable, so it is
    // the form a 100 TB aggregation must use. Its contract is RANK
    // accuracy: with accuracy parameter B, the returned value's rank is
    // within n/B of the target rank — assert exactly that (not value
    // closeness, which the contract doesn't promise on skewed data).
    val accuracy = 1000
    val li = T.lineitem(spark, sf001).select(col("l_returnflag"), col("l_extendedprice"))
    val rows = li.groupBy(col("l_returnflag"))
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.9D), $accuracy)").as("ap"),
           count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; (p, i) <- Seq(0.5, 0.9).zipWithIndex) {
      val flag = r.getString(0)
      val v = r.getSeq[Double](1)(i)
      val n = r.getLong(2).toDouble
      // measured rank of the returned value within its group
      val below = li.filter(col("l_returnflag") === flag)
        .filter(col("l_extendedprice") <= v).count().toDouble
      val rankErr = math.abs(below / n - p)
      assert(rankErr <= 1.0 / accuracy * 10 + 1.0 / n,
        s"group $flag p$p: rank error $rankErr exceeds tolerance (n=$n, v=$v)")
    }
  }
}
