package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

/** Salted join must be row-for-row equivalent to the plain equi-join. */
class SkewSpec extends SparkSpec {

  test("salted join equals plain join on a fact⋈dim shape") {
    val c = T.customer(spark, sf001)
    val n = T.nation(spark, sf001)
    val plain = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val salted = Skew.saltedJoin(
        c.withColumnRenamed("c_nationkey", "k"),
        n.withColumnRenamed("n_nationkey", "k"),
        Seq("k"), salts = 7)
      .select(col("c_custkey"), col("n_name"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salt actually spreads a hot key across sub-keys") {
    // all lineitems of one hot suppkey get distinct salt values
    val li = T.lineitem(spark, sf001).filter(col("l_suppkey") === 1)
    val salted = li.withColumn("s",
      pmod(hash(struct(li.columns.map(col).toIndexedSeq: _*)), lit(8)))
    val distinctSalts = salted.select("s").distinct().count()
    assert(distinctSalts > 1, "hot key stayed on one salt")
  }

  test("AQE splits a skewed join at runtime (the no-code-change path)") {
    // The other half of the skew posture: when the skew is discovered
    // at runtime rather than known up front, AQE's OptimizeSkewedJoin
    // must split the hot partition — salting (above) is for when the
    // operator owns the plan, AQE for when it doesn't. One hot key
    // carries ~all rows; thresholds are forced low so the sf0.001-scale
    // data trips the optimization, and the finalized adaptive plan
    // must mark the join skew=true.
    import spark.implicits._
    val hot = (1 to 20000).map(i => (1L, i.toLong)) ++ (1 to 50).map(i => (i.toLong + 1, i.toLong))
    val left = hot.toDF("k", "v")
    val right = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val prev = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.getOption("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = left.join(right.hint("merge"), "k")
      // execute THIS DataFrame's own QueryExecution (count() builds a
      // separate one, leaving this plan unfinalized)
      assert(joined.collect().length == 20050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
