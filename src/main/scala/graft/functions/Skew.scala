package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual fallback when AQE's
  * skew-join splitting isn't available or the skew is known up front
  * (SURVEY.md §4.2 / builder guidance: "skewed keys → salting or AQE
  * skew-join").
  *
  * A hot key funnels all its rows into one reduce task; salting spreads
  * them over `salts` sub-keys by giving the big side a deterministic
  * pseudo-random salt per row and replicating the small side across all
  * salt values. Semantics are exactly those of the plain equi-join —
  * proven by the equivalence property in SkewSpec. Cost model: big side
  * unchanged, small side ×salts — use when small×salts still fits the
  * shuffle (or broadcasts), and prefer plain AQE when skew is mild.
  */
object Skew {

  /** Inner equi-join of `big` and `small` on `keys`, salted `salts`
    * ways. Both inputs must not already contain the salt column name.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, saltCol: String = "__salt"): DataFrame = {
    require(salts > 0)
    // Deterministic per-row salt on the big side: hash of the whole row
    // (not just the key — the hot key's rows must spread).
    val bigSalted = big.withColumn(
      saltCol, pmod(hash(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    // Small side: one copy per salt value.
    val smallSalted = small.withColumn(
      saltCol, explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallSalted, keys :+ saltCol)
      .drop(saltCol)
  }
}
