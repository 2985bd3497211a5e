package graft

import graft.functions.Components

/** Min-label propagation must produce true connected components —
  * including transitive chains longer than one hop, which is exactly
  * what pairwise dedup output cannot express by itself.
  */
class ComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a transitive chain collapses to one canonical id") {
    // 1-2, 2-3, 3-4: one component, canonical 1 — needs ≥2 supersteps
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint clusters keep distinct canonicals") {
    val got = cc(Seq((10L, 20L), (30L, 40L), (40L, 50L)))
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 30L, 40L -> 30L, 50L -> 30L))
  }

  test("a star cluster converges in one superstep") {
    val got = cc(Seq((1L, 5L), (1L, 6L), (1L, 7L)))
    assert(got.values.toSet == Set(1L))
  }

  test("reliable-checkpoint mode converges to the same labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 20L))
    val got = Components.connectedComponents(
      pairs.toDF("id1", "id2"), reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                      10L -> 10L, 20L -> 10L))
  }

  test("non-convergence within maxIter raises instead of returning partial labels") {
    import spark.implicits._
    // An 8-node chain cannot finish min-propagation in one superstep.
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
