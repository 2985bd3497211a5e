package graft

import graft.ops.PreferenceOps
import org.apache.spark.sql.functions._

/** Semantic checks for the preference/annotation QA ops (q267/q268):
  * the oracle gate proves cross-engine equality; these prove the
  * STATISTICS are right — kappa against an independent from-scratch
  * reimplementation, Bradley-Terry against its defining fixed-point
  * properties — plus the boundary-margin audit that backs the float
  * tail of q268's oracle.
  */
class PreferenceOpsSpec extends SparkSpec {

  test("fleiss kappa matches an independent Scala reimplementation (q267)") {
    val out = PreferenceOps.queries("q267_rater_agreement")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // recompute the three raters and kappa from the raw table, straight
    // from the Fleiss formula (floats, no integer-ratio shortcut)
    val docs = T.documents(spark, sf001)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map { r =>
        val nc = r.getLong(2)
        val text = r.getString(3)
        val nt = text.count(_ == ' ') + 1
        val ra = if (nc < 175) 0 else if (nc < 419) 1 else 2
        val rb = if (nt < 40) 0 else if (nt < 70) 1 else 2
        val rc = if (2 * nc < 9 * nt) 0 else if (2 * nc < 11 * nt) 1 else 2
        (r.getString(1), Seq(ra, rb, rc))
      }
    val byLang = docs.groupBy(_._1)
    assert(out.map(_._1).toSeq === byLang.keys.toSeq.sorted)
    out.foreach { case (lang, n, c9, c5, c3, ppm) =>
      val ratings = byLang(lang).map(_._2)
      assert(n === ratings.length && c9 + c5 + c3 === n)
      val nij = ratings.map(cs => (0 to 2).map(c => cs.count(_ == c)))
      assert(c9 === nij.count(_.map(x => x * x).sum == 9))
      assert(c5 === nij.count(_.map(x => x * x).sum == 5))
      val pbar = nij.map(v => (v.map(x => x * x).sum - 3) / 6.0).sum / n
      val pj = (0 to 2).map(c => nij.map(_(c)).sum / (3.0 * n))
      val pe = pj.map(x => x * x).sum
      val kappa = (pbar - pe) / (1 - pe)
      // the op's ppm is the exact integer ratio truncated toward zero
      assert(math.abs(ppm / 1e6 - kappa) < 2e-6,
        s"$lang: op ppm $ppm vs reference kappa $kappa")
      assert(ppm > 0L && ppm < 1000000L,
        s"$lang: heuristic raters must agree above chance, got $ppm ppm")
    }
  }

  test("widened kappa tier equals the BIGINT tier row-for-row (q267b)") {
    // both tiers compute the same exact integer ratio; the DECIMAL
    // widening only moves the overflow envelope (7e5 → 2e15 docs/lang)
    val base = PreferenceOps.queries("q267_rater_agreement")(spark, sf001).collect()
      .map(_.toSeq)
    val wide = PreferenceOps.queries("q267b_rater_agreement_wide")(spark, sf001).collect()
      .map(_.toSeq)
    assert(wide.toSeq === base.toSeq)
  }

  test("bradley-terry: conservation, positivity, fixed-point sanity, boundary margins (q268)") {
    val raw = PreferenceOps.btStrengths(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // every source dueled; wins within comparisons; total wins = #duels
    // and total comparisons double-count them
    assert(raw.length === 20)
    raw.foreach { case (s, w, c, p) =>
      assert(w >= 0 && w <= c, s"$s: wins $w outside comparisons $c")
      assert(p > 0.0, s"$s: smoothed strength must be strictly positive")
    }
    assert(raw.map(_._2).sum * 2 === raw.map(_._3).sum,
      "total wins must equal half the directed comparison count")
    // strengths are a normalized distribution
    assert(math.abs(raw.map(_._4).sum - 1.0) < 1e-9)
    // monotone sanity on the dominant axis: the top-wins source must
    // out-rank the bottom-wins source (same comparison volume regime)
    val best = raw.maxBy(r => r._2.toDouble / r._3)
    val worst = raw.minBy(r => r._2.toDouble / r._3)
    assert(best._4 > worst._4,
      s"win-rate order inverted: $best vs $worst")
    // boundary-margin audit (the float-tail argument of the oracle):
    // every strength's 4th digit must sit far from a .00005 edge, so
    // DuckDB's different sum association can never flip the rounding
    Seq(sf001, sf("sf0.01")).foreach { d =>
      PreferenceOps.btStrengths(spark, d).collect().foreach { r =>
        val frac = r.getDouble(3) * 1e4
        val distToHalf = math.abs(frac - math.floor(frac) - 0.5)
        assert(distToHalf > 1e-6,
          s"${r.getString(0)} at $d: strength ${r.getDouble(3)} within " +
            s"drift headroom of a round-4 boundary")
      }
    }
  }

  test("bradley-terry output is shuffle-partition invariant (q268)") {
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    val runs = Seq("2", "4", "32").map { sp =>
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      try PreferenceOps.queries("q268_source_bt_strength")(spark, sf001)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", orig)
    }
    assert(runs.distinct.size === 1,
      "BT strengths must not depend on the partition layout")
  }
}
