package graft

import graft.functions.ScalableRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ScalableRank must reproduce Spark's own window semantics exactly —
  * including tie handling, which q31/q35 cannot exercise (their
  * orderings carry a unique tiebreaker). Ties are the hard part of the
  * two-phase decomposition: rank offsets are only correct because
  * equal (key, order) tuples never straddle a range partition.
  */
class ScalableRankSpec extends SparkSpec {

  import spark.implicits._

  // 3 keys × 200 rows with HEAVY ties (value = i % 7) — every rank
  // function diverges from row_number here.
  private lazy val df = (1 to 600).map { i =>
    (s"k${i % 3}", (i % 7).toDouble, i.toLong)
  }.toDF("key", "value", "id")

  private def reference(desc: Boolean) = {
    val ord = if (desc) Seq(col("value").desc, col("id")) else Seq(col("value"), col("id"))
    val ordTies = if (desc) Seq(col("value").desc) else Seq(col("value"))
    val w = Window.partitionBy(col("key")).orderBy(ordTies: _*)
    val wU = Window.partitionBy(col("key")).orderBy(ord: _*)
    df.select(col("key"), col("value"), col("id"),
      row_number().over(wU).cast("long").as("e_rn"),
      rank().over(w).cast("long").as("e_rnk"),
      dense_rank().over(w).cast("long").as("e_drnk"),
      ntile(4).over(wU).cast("long").as("e_ntile"),
      percent_rank().over(w).as("e_pr"),
      cume_dist().over(w).as("e_cd"))
  }

  private def twoPhase(desc: Boolean, parts: Int) = {
    val ord = if (desc) Seq(col("value").desc, col("id")) else Seq(col("value"), col("id"))
    ScalableRank.withRanks(df, Seq("key"), ord, Seq(col("value"), col("id")), parts)
  }

  test("row_number/ntile match the plain window across partition counts (unique ordering)") {
    for (parts <- Seq(1, 7, 32)) {
      val got = twoPhase(desc = false, parts)
        .select(col("key"), col("id"), col("rn"),
                ScalableRank.ntileFrom(col("rn"), col("ntot"), 4).as("nt"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val exp = reference(desc = false)
        .collect().map(r => (r.getString(0), r.getLong(2)) -> (r.getLong(3), r.getLong(6))).toMap
      assert(got == exp, s"parts=$parts")
    }
  }

  test("rank/dense_rank/percent_rank/cume_dist match under heavy ties") {
    // rank semantics are defined by `order` (value alone — 7 distinct
    // values, ~29 ties each per key); `suffix` (id) only makes rn
    // deterministic. Compare the tie-sensitive functions against plain
    // windows ordered by value alone.
    val ranked = ScalableRank.withRanks(
      df, Seq("key"), Seq(col("value")), Seq(col("value")), 7,
      suffix = Seq(col("id")))
    val got = ranked.select(col("key"), col("id"), col("rnk"), col("drnk"),
        ScalableRank.percentRankFrom(col("rnk"), col("ntot")).as("pr"),
        ScalableRank.cumeDistFrom(col("cume"), col("ntot")).as("cd"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val exp = reference(desc = false).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(4), r.getLong(5), r.getDouble(7), r.getDouble(8))).toMap
    assert(got == exp)
  }

  test("withRunningSum matches the plain cumulative window across partition counts") {
    val exp = df.select(col("key"), col("id"),
        sum(col("value")).over(Window.partitionBy(col("key"))
          .orderBy(col("value"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = ScalableRank.withRunningSum(
          df, Seq("key"), Seq(col("value"), col("id")), col("value"), parts)
        .select(col("key"), col("id"), col("rsum"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == exp, s"parts=$parts")
    }
  }

  test("withRunningSumMinMax matches nested plain windows across partition counts") {
    // signed values so the cumulative series genuinely oscillates and
    // the prefix extrema change hands across range partitions
    val sdf = (1 to 600).map { i =>
      (s"k${i % 3}", (i % 11).toLong - 5L, i.toLong)
    }.toDF("key", "v", "id")
    val wc = Window.partitionBy(col("key")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = sdf
      .withColumn("c", sum(col("v")).over(wc))
      .select(col("key"), col("id"), col("c"),
        min(col("c")).over(wc).as("m"), max(col("c")).over(wc).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = ScalableRank.withRunningSumMinMax(
          sdf, Seq("key"), Seq(col("id")), col("v"), parts)
        .select(col("key"), col("id"), col("rsum"), col("rmin"), col("rmax"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == exp, s"parts=$parts")
    }
  }

  test("descending order and single-row keys are handled") {
    val gotDesc = twoPhase(desc = true, 7)
      .select(col("key"), col("id"), col("rn")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expDesc = reference(desc = true).collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(gotDesc == expDesc)

    // single-row key: ntile over ntot < t takes the lazy when-branch
    // (divisor base = 0 must never be evaluated), percent_rank is 0
    val one = Seq(("solo", 1.0, 1L)).toDF("key", "value", "id")
    val r = ScalableRank.withRanks(one, Seq("key"),
        Seq(col("value"), col("id")), Seq(col("value"), col("id")), 4)
      .select(ScalableRank.ntileFrom(col("rn"), col("ntot"), 4).as("nt"),
              ScalableRank.percentRankFrom(col("rnk"), col("ntot")).as("pr"),
              ScalableRank.cumeDistFrom(col("cume"), col("ntot")).as("cd"))
      .collect()(0)
    assert(r.getLong(0) == 1L && r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
  }
}
