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
}
