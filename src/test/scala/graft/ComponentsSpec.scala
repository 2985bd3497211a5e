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

  test("one action per superstep — convergence rides the checkpoint, no count action") {
    import spark.implicits._
    // The observe-based loop must NOT run a separate count action per
    // superstep (round-3 verdict item 7): the old shape's next⋈labels
    // count re-shuffled 2× the label relation every superstep. Raw job
    // counts are meaningless under AQE (every shuffle stage is a job),
    // so assert on Dataset ACTIONS via QueryExecutionListener: the only
    // action names allowed are the checkpoints, and the total is
    // bounded by supersteps + setup. A 4-node chain converges in 2
    // supersteps (init folds the first hop) + 1 zero-change pass.
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = names.add(funcName)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = names.add(funcName)
    }
    // the listener bus is asynchronous: wait until the count is stable
    def stableCount(): Int = {
      var prev = -1; var cur = names.size()
      while (cur != prev) { prev = cur; Thread.sleep(500); cur = names.size() }
      cur
    }
    spark.listenerManager.register(qel)
    try {
      stableCount(); names.clear()
      Components.connectedComponents(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2"))
      stableCount()
      val actions = names.toArray(Array.empty[String]).toSeq
      assert(!actions.contains("count"),
        s"a separate convergence count action has crept back in: $actions")
      assert(actions.size <= 7,
        s"${actions.size} actions for a 3-superstep run (expected ≤ 7 " +
          s"checkpoints: edges + init + one per superstep): $actions")
    } finally spark.listenerManager.unregister(qel)
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
