package graft

import graft.functions.TextSim
import org.apache.spark.sql.functions._

/** Sketch-tier guarantees that the SQL oracle can't express: MinHash /
  * SimHash recall against the exact Jaccard pairs, plus algebraic
  * properties of the similarity (dedup idempotence, symmetry).
  */
class TextSimSpec extends SparkSpec {

  private lazy val docs = T.documents(spark, sf001)
  private lazy val sh = TextSim.shingles(docs, 3).cache()
  private lazy val exact08 = TextSim.jaccardPairs(sh, 0.8)
    .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact jaccard finds the planted near-duplicates") {
    assert(exact08.nonEmpty, "sf0.001 documents should contain planted near-dups")
  }

  test("minhash-LSH candidates have full recall on >0.9-jaccard pairs") {
    val sig = TextSim.minhashSignature(sh, 128)
    val cand = TextSim.bandCandidates(TextSim.lshBands(sig, 32, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact08 -- cand
    assert(missed.isEmpty, s"LSH missed planted pairs: $missed")
  }

  test("simhash single-block-band candidates have full recall on planted pairs") {
    val cand = TextSim.bandCandidates(TextSim.simhashBands(TextSim.simhash(sh)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact08 -- cand
    assert(missed.isEmpty, s"simhash banding missed planted pairs: $missed")
  }

  test("simhash combo-band candidates have full recall on planted pairs") {
    val cand = TextSim.bandCandidates(
      TextSim.simhashComboBands(TextSim.simhash(sh)).drop("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact08 -- cand
    assert(missed.isEmpty, s"combo banding missed planted pairs: $missed")
  }

  test("combo bands cover every hamming <= 13 pair (pigeonhole radius)") {
    // All-pairs hamming vs band candidacy on the real corpus: every
    // pair within the guaranteed radius must be a candidate, so the
    // prefilter in q63 (<= 13) never drops a band-guaranteed pair.
    val sig = TextSim.simhash(sh).cache()
    val within = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(TextSim.hamming(col("a.simhash"), col("b.simhash")) <= 13)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = TextSim.bandCandidates(
      TextSim.simhashComboBands(sig).drop("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = within -- cand
    assert(missed.isEmpty, s"pairs within radius missed by combo bands: $missed")
    sig.unpersist()
  }

  test("simhash candidate volume scales subquadratically with corpus size") {
    // The round-1 single-block banding made O(n²/16) pairs reach the
    // verify join. The combo path's post-prefilter candidates must
    // track the true near-dup count, not n²: a random pair passes
    // hamming <= 13 with P ~ 3e-6, so candidates stay below n (a
    // linear bound) at both scales — quadratic leakage at sf0.01
    // (125k doc pairs) would blow far past it.
    def candidates(dir: String): Long =
      TextSim.simhashCandidates(
        TextSim.simhash(TextSim.shingles(T.documents(spark, dir), 3))).count()
    val n001 = T.documents(spark, sf001).count()
    val n01 = T.documents(spark, "/root/testdata/sf0.01").count()
    val c001 = candidates(sf001)
    val c01 = candidates("/root/testdata/sf0.01")
    assert(c001 <= n001, s"sf0.001 candidates $c001 exceed linear bound $n001")
    assert(c01 <= n01, s"sf0.01 candidates $c01 exceed linear bound $n01")
  }

  test("verified sketch output equals exact output at the same threshold") {
    val sig = TextSim.minhashSignature(sh, 128)
    val cand = TextSim.bandCandidates(TextSim.lshBands(sig, 32, 4))
    val verified = TextSim.verifyJaccard(cand, sh, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = TextSim.jaccardPairs(sh, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(verified == exact)
  }

  test("pair relation is canonical (id1 < id2) — symmetry collapsed once") {
    val bad = TextSim.jaccardPairs(sh, 0.6).filter(col("id1") >= col("id2")).count()
    assert(bad == 0)
  }

  test("exact dedup is idempotent") {
    val once = docs.dropDuplicates("lang", "source")
    val twice = once.dropDuplicates("lang", "source")
    assert(once.count() == twice.count())
  }

  test("simhash of identical texts is identical, hamming 0") {
    val two = docs.limit(1).select(lit(1L).as("doc_id"), col("text"))
      .union(docs.limit(1).select(lit(2L).as("doc_id"), col("text")))
    val sigs = TextSim.simhash(TextSim.shingles(two, 3)).collect().map(_.getLong(1))
    assert(sigs(0) == sigs(1))
  }

  test("per-row signatures are bit-identical to the aggregate form") {
    // The streaming path (minhashSignatureRow) and the batch path
    // (minhashSignature) must emit the SAME 128 values per doc — the
    // stream twin's recall argument rests on this equality.
    val n = 16 // narrower width keeps the collect small; same hash family
    val agg = TextSim.minhashSignature(TextSim.shingles(docs, 3), n)
      .collect().map(r => r.getLong(0) -> (1 to n).map(i => r.getLong(i))).toMap
    val row = TextSim.minhashSignatureRow(docs, n, 3)
      .collect().map(r => r.getLong(0) -> (2 to n + 1).map(i => r.getLong(i))).toMap
    assert(agg.keySet == row.keySet, "different doc coverage")
    agg.foreach { case (id, sig) =>
      assert(sig == row(id), s"doc $id: row/agg signatures diverge")
    }
  }
}
