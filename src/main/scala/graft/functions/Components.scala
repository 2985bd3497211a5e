package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — turns the dedup
  * family's near-dup PAIRS into canonical-id assignments (every doc in
  * a duplicate cluster maps to the cluster's smallest id, the
  * representative a pipeline keeps).
  *
  * Algorithm: iterative min-label propagation. Each superstep joins the
  * current labels across the (bidirectional) edge list and takes the
  * elementwise min — entirely distributed, one shuffle per superstep,
  * converging in O(diameter) ≤ O(log n) supersteps for near-dup
  * clusters (which are tiny and dense in practice). The driver loop
  * only orchestrates supersteps and checks the convergence count; no
  * row data ever reaches the driver. localCheckpoint truncates the
  * iterative lineage so plans stay constant-size.
  */
object Components {

  /** pairs: (id1, id2) with id1 < id2. Returns (doc_id, canonical_id)
    * for every doc appearing in at least one pair.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // One eager checkpoint materializes the (possibly expensive) pair
    // pipeline; everything downstream reuses those blocks.
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint(true)
    // Init = first superstep folded in: label every node with
    // min(self, direct neighbors). Saves one loop round.
    var labels = edges
      .groupBy(col("a")).agg(min(col("b")).as("mb"))
      .select(col("a").as("id"), least(col("a"), col("mb")).as("comp"))
      .localCheckpoint(false)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("comp")).as("ncomp"))
      // lazy checkpoint: the convergence count below is the single
      // action that both materializes `next` and measures progress.
      val next = labels
        .join(neighborMin, labels("id") === neighborMin("a"), "left_outer")
        .select(col("id"),
                least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint(false)
      changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.comp") =!= col("o.comp"))
        .count()
      labels = next
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("comp").as("canonical_id"))
  }
}
