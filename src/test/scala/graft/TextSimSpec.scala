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

  test("simhash byte-band candidates have full recall on planted pairs") {
    val cand = TextSim.bandCandidates(TextSim.simhashBands(TextSim.simhash(sh)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact08 -- cand
    assert(missed.isEmpty, s"simhash banding missed planted pairs: $missed")
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
}
