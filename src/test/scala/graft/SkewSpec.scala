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
}
