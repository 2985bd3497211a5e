package graft

import graft.ops.Joins

/** Planted-data semantics for the join-family helpers (the catalog
  * queries themselves are oracle-checked; these pin the edge cases the
  * TPC-H-ish data cannot produce).
  */
class JoinsSpec extends SparkSpec {

  test("fkEdgeAudit counts real orphans, excludes NULL FKs (MATCH SIMPLE), counts all child rows (q154)") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(8L), None)
      .toDF("fk_col")
    val out = Joins.fkEdgeAudit("child.fk->parent", child, "fk_col", parent, "pk")
      .as[(String, Long, Long)].head()
    // 5 child rows; orphans are 9 and 8; the NULL FK is valid.
    assert(out == (("child.fk->parent", 5L, 2L)))
    // Clean edge: zero orphans, not an empty frame.
    val clean = Joins.fkEdgeAudit("c", Seq(1L, 2L).toDF("fk_col"), "fk_col", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(clean == (("c", 2L, 0L)))
  }

  test("negative sampling: CDF inversion replayed in driver, positives filtered, popularity bias real (q256)") {
    val rows = graft.ops.Joins.queries("q256_negative_sampling")(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    def h10(sc: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sc.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 10), 16)
    }
    val li = graft.T.lineitem(spark, sf001).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custOf = graft.T.orders(spark, sf001).select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pop = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedPks = pop.keys.toSeq.sorted
    val cum = sortedPks.scanLeft(0L)((a, p) => a + pop(p)).tail
    val t = cum.last
    val hist = li.map(e => (custOf(e._1), e._2)).toSet
    val custs = custOf.values.toSet
    var expected = Map.empty[(Long, Int), Long]
    for (c <- custs; s <- 0 until 8) {
      val u = h10(s"$c:$s") % t + 1
      val idx = cum.indexWhere(_ >= u)
      val pk = sortedPks(idx)
      if (!hist.contains((c, pk))) expected += ((c, s) -> pk)
    }
    assert(rows === expected)
    // the draw must be popularity-weighted: drawn items are on average
    // more popular than a uniform pick over the catalog
    val meanDrawnPop = rows.values.map(pop).sum.toDouble / rows.size
    val meanUniformPop = pop.values.sum.toDouble / pop.size
    assert(meanDrawnPop > meanUniformPop,
      f"drawn mean pop $meanDrawnPop%.2f must exceed uniform $meanUniformPop%.2f")
  }
}
