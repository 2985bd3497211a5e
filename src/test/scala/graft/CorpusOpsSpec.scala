package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.functions._

/** Properties of the corpus-preparation operators that the SQL oracle
  * can't express: the winnowing containment guarantee, split
  * stability/disjointness, and decontamination recall on the planted
  * near-duplicates.
  */
class CorpusOpsSpec extends SparkSpec {

  test("winnowing guarantee: docs sharing a >=6-word run share a fingerprint") {
    import spark.implicits._
    // Two docs with a common 8-word run embedded in different contexts:
    // with k=3 and w=4, any shared run of >= k+w-1 = 6 words must yield
    // at least one common selected fingerprint.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"intro words here $shared closing remarks"),
      (2L, s"$shared totally different tail of text goes on and on")
    ).toDF("doc_id", "text")
    val fp = CorpusOps.queries("q82_winnow_fingerprint")
    // the operator reads a parquet dir, so stage the two docs as one
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = fp(spark, dir)
    val byDoc = out.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val common = byDoc(1L) intersect byDoc(2L)
    assert(common.nonEmpty, "shared 8-word run produced no shared fingerprint")
  }

  test("hash split is disjoint, exhaustive, and stable across runs") {
    val q = CorpusOps.queries("q86_hash_split")
    val a = q(spark, sf001).collect()
    val b = q(spark, sf001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "split not deterministic")
    val totals = a.map(_.getLong(2)).sum
    assert(totals == T.documents(spark, sf001).count(), "splits don't partition the corpus")
  }

  test("decontamination flags the planted near-duplicates of benchmark docs") {
    // documents has planted near-dup pairs (jaccard >= 0.96). Any dup
    // partner (doc_id >= 20) of a benchmark doc (doc_id < 20) shares
    // nearly all 5-grams and MUST be flagged.
    val exact = graft.functions.TextSim.jaccardPairs(
      graft.functions.TextSim.shingles(T.documents(spark, sf001), 3), 0.8)
      .filter(col("id1") < 20 && col("id2") >= 20)
      .select(col("id2")).collect().map(_.getLong(0)).toSet
    val flagged = CorpusOps.queries("q87_decontaminate")(spark, sf001)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged),
      s"near-dup partners of benchmark docs not flagged: ${exact -- flagged}")
  }
}
