package graft

import graft.functions.{TextKernels, TextSim}
import org.apache.spark.sql.functions._

/** The native MinHash kernel's bit-compatibility contract: the codegen
  * expression, the aggregate form, and the per-row HOF form must emit
  * the SAME 128 longs per doc — then bands, candidates, and the verified
  * pair relation are provably unchanged when the production paths swap
  * in the kernel.
  */
class TextKernelsSpec extends SparkSpec {

  private lazy val docs = T.documents(spark, sf001)

  private def sigRows(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("doc_id") +: (0 until n).map(i => col(s"h$i")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to n).map(r.getLong).toVector)
      .toMap

  test("native kernel signatures are bit-identical to the aggregate form") {
    val n = 128
    val agg = sigRows(TextSim.minhashSignature(TextSim.shingles(docs, 3), n), n)
    val native = sigRows(TextSim.minhashSignatureNative(docs, n, 3), n)
    assert(native.keySet === agg.keySet,
      "kernel and aggregate forms must cover the same docs (short docs drop from both)")
    val diff = agg.keys.filter(k => agg(k) != native(k))
    assert(diff.isEmpty, s"signatures differ for docs: ${diff.take(5).toList}")
  }

  test("native kernel matches the HOF row form too (streaming twin)") {
    val n = 16
    val hof = sigRows(TextSim.minhashSignatureRow(docs.limit(50), n, 3), n)
    val native = sigRows(TextSim.minhashSignatureNative(docs.limit(50), n, 3), n)
    assert(native === hof)
  }

  test("docs shorter than the shingle width return NULL and drop out") {
    import spark.implicits._
    TextKernels.ensureRegistered(spark)
    val tiny = Seq((1L, "only two"), (2L, "exactly three words"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextSim.minhashSignatureNative(tiny, 8, 3)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(2L))
    // and the aggregate form agrees on the surviving doc
    val agg = sigRows(TextSim.minhashSignature(TextSim.shingles(tiny, 3), 8), 8)
    assert(sigRows(out, 8) === agg)
  }

  test("duplicate grams do not perturb the min (distinct-free is exact)") {
    import spark.implicits._
    // 'a a a a a a' has one distinct gram 'a a a' appearing 4 times
    val rep = Seq((1L, "a a a a a a"), (2L, "a a a")).toDF("doc_id", "text")
    val native = sigRows(TextSim.minhashSignatureNative(rep, 8, 3), 8)
    assert(native(1L) === native(2L),
      "multiset min must equal distinct-set min for identical gram sets")
  }

  test("native simhash is bit-identical to the aggregate form") {
    val agg = TextSim.simhash(TextSim.shingles(docs, 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = TextSim.simhashNative(docs, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.keySet === agg.keySet)
    val diff = agg.keys.filter(k => agg(k) != native(k))
    assert(diff.isEmpty, s"simhash differs for docs: ${diff.take(5).toList}")
  }

  test("native simhash dedups repeated grams like the distinct aggregate") {
    import spark.implicits._
    // 'a b c a b c a b c' repeats grams; one doc with the distinct gram
    // set must hash identically.
    val rep = Seq((1L, "a b c a b c a b c"), (2L, "x y")).toDF("doc_id", "text")
    val agg = TextSim.simhash(TextSim.shingles(rep, 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = TextSim.simhashNative(rep, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === agg, "short doc must drop from both; repeats must dedup")
  }

  test("SQL surface: wrong arity fails analysis with the signature") {
    TextKernels.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a','b'), 3)").collect()
    }
    assert(e.getMessage.contains("graft_minhash"))
  }
}
