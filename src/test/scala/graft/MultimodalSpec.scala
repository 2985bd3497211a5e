package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload round-trip, stub-decode
  * determinism, frame sampling bounds, and batch-shaped feature
  * extraction correctness.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = T.documents(spark, sf001)
  private lazy val meta = Multimodal.decodeMeta(Multimodal.withPayload(docs)).cache()

  test("payload is binary and byte length matches the source text") {
    val r = meta.select(col("n_bytes"), length(col("payload")).as("pl"),
                        length(col("payload")).cast("long").as("expected")).limit(20).collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1)))
    val schema = Multimodal.withPayload(docs).schema("payload").dataType.typeName
    assert(schema == "binary")
  }

  test("stub decode is deterministic and in range") {
    val rows = meta.select("width", "height", "n_frames").collect()
    rows.foreach { r =>
      assert(r.getInt(0) >= 16 && r.getInt(0) < 656)
      assert(r.getInt(1) >= 16 && r.getInt(1) < 496)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 30)
    }
    val again = Multimodal.decodeMeta(Multimodal.withPayload(docs))
      .select("width", "height", "n_frames").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("frame sampling emits at most ~maxFrames strided indices within range") {
    val s = Multimodal.sampleFrames(meta, maxFrames = 8)
      .groupBy("doc_id").agg(count(lit(1)).as("k"), max("frame_idx").as("mx"),
                             first("n_frames").as("nf")).collect()
    s.foreach { r =>
      assert(r.getLong(1) <= 8)
      assert(r.getInt(2) < r.getInt(3))
    }
  }

  test("mapPartitions feature extraction: histogram sums to payload length") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
    val joined = feats.join(meta.select("doc_id", "n_bytes"), "doc_id")
      .select(col("doc_id"), expr("aggregate(hist, 0L, (a, x) -> a + x)").as("total"),
              col("n_bytes").cast("long").as("nb"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }
}
