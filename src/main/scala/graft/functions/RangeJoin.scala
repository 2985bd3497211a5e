package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval (range) join — SURVEY §2.2 lists range joins as
  * "expressible as theta-join"; a raw theta join plans as
  * broadcast-nested-loop, which is O(|points|·|intervals|) and only
  * viable when one side is tiny. This helper is the scale path: both
  * sides are bucketed into fixed time bands, intervals are replicated
  * into every band they overlap, and the join runs as an EQUI-join on
  * the band key with the exact containment predicate applied after.
  *
  * Cost: shuffle on band + Σ_band |points_b|·|intervals_b| — local
  * products per band instead of the global product. Choose bandSeconds
  * near the typical interval length: shorter bands → more replication,
  * longer bands → denser band products.
  */
object RangeJoin {

  /** Join `points` (event rows with timestamp `ptsCol`) to `intervals`
    * (rows with [startCol, endCol] timestamps, inclusive) on
    * containment. Output: all columns of both inputs for matching
    * pairs. A point matches an interval iff start ≤ pt ≤ end.
    */
  def bandedIntervalJoin(points: DataFrame, ptsCol: String,
                         intervals: DataFrame, startCol: String, endCol: String,
                         bandSeconds: Long): DataFrame = {
    val pBand = (unix_timestamp(col(ptsCol)) / bandSeconds).cast("long")
    val p = points.withColumn("__band", pBand)
    // replicate each interval into every band it overlaps (inclusive)
    val i = intervals.withColumn("__band", explode(sequence(
      (unix_timestamp(col(startCol)) / bandSeconds).cast("long"),
      (unix_timestamp(col(endCol)) / bandSeconds).cast("long"))))
    p.join(i, Seq("__band"))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) <= col(endCol))
      .drop("__band")
  }
}
