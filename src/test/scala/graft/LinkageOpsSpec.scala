package graft

import graft.ops.LinkageOps
import org.apache.spark.sql.functions._

/** FastSS deletion-neighborhood linkage (q159): the candidate generator
  * must be COMPLETE for edit distance <= 1 (every true pair survives)
  * and the verify must keep it EXACT (no ED-2 pair leaks through). The
  * sf0.01 oracle gate already proves completeness against the naive
  * all-pairs join on real data; these specs pin the adversarial corners
  * that data may not contain.
  */
class LinkageOpsSpec extends SparkSpec {

  import spark.implicits._

  private def link(master: Seq[(Long, String)], dirty: Seq[(Long, String)]) =
    LinkageOps.fuzzyLink(
      master.toDF("c_custkey", "c_name"),
      dirty.toDF("link_id", "nm"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("all four edit kinds land on the right master; ED-2 stays out") {
    val master = Seq(1L -> "Customer#0001", 2L -> "Supplier#0002")
    val dirty = Seq(
      10L -> "Customer#0001",  // exact
      11L -> "Custmer#0001",   // deletion
      12L -> "Customer#0X01",  // substitution
      13L -> "Customer#00011", // insertion
      14L -> "Custmer#001",    // ED 2 from everything -> none
      15L -> "Xustomer#0X01")  // ED 2 -> none
    val got = link(master, dirty)
    assert(got(10L) === ((1L, 1L, "unique")))
    assert(got(11L) === ((1L, 1L, "unique")))
    assert(got(12L) === ((1L, 1L, "unique")))
    assert(got(13L) === ((1L, 1L, "unique")))
    assert(got(14L) === ((0L, -1L, "none")))
    assert(got(15L) === ((0L, -1L, "none")))
  }

  test("ambiguity is surfaced, not resolved silently") {
    // "ab" is ED 1 from both "aab"-style masters; min key reported.
    val master = Seq(7L -> "axb", 3L -> "ayb", 9L -> "zzz")
    val got = link(master, Seq(20L -> "ab"))
    assert(got(20L) === ((2L, 3L, "ambiguous")))
  }

  test("deletion-neighborhood pairing equals the naive all-pairs fuzzy join") {
    // Random-ish small universe; ground truth via a cross join. This is
    // the spec-level twin of the sf0.01 oracle (which is also naive).
    val master = (0L until 40L).map(i => i -> f"Rec#${i * 7 % 100}%03d-${"abcde" (i.toInt % 5)}")
    val dirty = (0L until 40L).map { i =>
      val base = f"Rec#${i * 7 % 100}%03d-${"abcde" (i.toInt % 5)}"
      val mut = i % 3 match {
        case 0 => base.substring(0, 2) + base.substring(3) // delete
        case 1 => base.substring(0, 4) + "Q" + base.substring(5) // substitute
        case _ => base + "T" // append
      }
      (100L + i) -> mut
    }
    val naive = master.toDF("c_custkey", "c_name")
      .crossJoin(dirty.toDF("link_id", "nm"))
      .filter(levenshtein(col("nm"), col("c_name")) <= 1)
      .select("link_id", "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = LinkageOps.delNeighborhood(dirty.toDF("link_id", "nm"), "link_id")
      .join(
        LinkageOps.delNeighborhood(
          master.toDF("c_custkey", "c_name").select(col("c_custkey"), col("c_name").as("nm")),
          "c_custkey").withColumnRenamed("nm", "mnm"),
        Seq("vh"))
      .filter(levenshtein(col("nm"), col("mnm")) <= 1)
      .select("link_id", "c_custkey")
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "planted universe must contain true fuzzy pairs")
    assert(fast === naive)
  }

  test("sorted neighborhood: window pairs exactly, verify filters, w bounds candidates (q211)") {
    import spark.implicits._
    val recs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aaac"), (4L, "zzzz"))
      .toDF("key", "nm")
    // w=3 covers all C(4,2)=6 rank pairs; maxDist=2 keeps only the
    // three distance-1 'aaa?' pairs, drops every pair with zzzz (4).
    val got = graft.ops.LinkageOps.sortedNeighborhood(recs, w = 3, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(got === Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
    // w=1 compares adjacent ranks only: the (1,3) pair disappears even
    // though its distance qualifies — the window, not the verifier,
    // bounds candidate volume.
    val w1 = graft.ops.LinkageOps.sortedNeighborhood(recs, w = 1, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(w1 === Seq((1L, 2L), (2L, 3L)))
  }
}
