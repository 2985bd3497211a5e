package graft.ops
import graft.T
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference / annotation-data QA — the RLHF-era corner of the LLM
  * data-pipeline brief: before pairwise preference data (or an
  * ensemble of cheap quality raters) feeds a reward model or a
  * curation gate, two audits are standard practice and neither was in
  * the catalog until round 10:
  *
  *  - inter-rater agreement (Fleiss' kappa, q267): do the independent
  *    raters agree beyond chance at all? Kappa near 0 means the
  *    "quality" signal is noise and every downstream threshold is
  *    arbitrary.
  *  - pairwise preference strength (Bradley-Terry, q268): turn duels
  *    into per-item strengths — the model behind reward-model data
  *    health checks and chatbot-arena-style leaderboards (Hunter 2004's
  *    MM algorithm; Bradley & Terry 1952).
  *
  * Both are built on the engine's deterministic-coin discipline
  * (md5 draws, integer-exact arithmetic where a discrete output could
  * sit on an engine boundary), so both are FULLY oracle-checked.
  *
  * Scale posture: q267 is one corpus scan + (doc, cat)-keyed partial
  * aggregation + a per-lang rollup — nothing quadratic, no windows.
  * q268's duel sample is the q211 sorted-neighborhood shape (md5
  * bucket, rank inside bucket, pair with the next two neighbors), so
  * comparisons are O(N) however large the corpus; everything after the
  * duel counts is ≤ |sources|² rows and rides broadcasts.
  */
object PreferenceOps {
  type Q = (SparkSession, String) => DataFrame

  /** Engine-neutral 32-bit hash (md5 prefix) — the shared coin idiom. */
  private def h32(c: Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Duel-sample buckets for q268. 256 is right for the test SFs
    * (~2-20 docs/bucket); at corpus scale the dial is B ≈ N/10⁶ so the
    * per-bucket sort stays bounded while the window key stays
    * high-cardinality (the CLAUDE/ScalableRank low-card rule).
    */
  val BT_BUCKETS = 256

  /** Fixed MM iteration count — unrolled in the oracle like every
    * Lloyd chain in VectorOps.
    */
  val BT_ITERS = 3

  /** Fleiss' kappa SQL, shared between engines up to the integer-
    * division token (`//` DuckDB, `div` Spark). Three deterministic
    * "raters" grade every document into 3 categories from integer
    * arithmetic only (char count, whitespace-token count, and average
    * word length via cross-multiplication — never a float threshold,
    * so a category can never flip across engines):
    *
    *   rA: n_chars       < 175 / < 419 / else        (short/mid/long)
    *   rB: ws tokens     < 40  / < 70  / else
    *   rC: avg word len  < 4.5 / < 5.5 / else, tested as
    *       2·n_chars < 9·nt and 2·n_chars < 11·nt    (exact ints)
    *
    * The kappa itself is computed as ONE exact integer ratio: with
    * n = 3 raters and k = 3 categories, a document's Σ_j n_ij² is 9
    * (full agreement), 5 (2-1 split) or 3 (all differ), so
    * P̄ = (6·c9 + 2·c5)/(6N) and P_e = (Σ_j m_j²)/(9N²) — and
    * κ = (3aN − 2b)/(18N² − 2b) with a = 6c9+2c5, b = Σm_j², all
    * BIGINT. Output as sign-split magnitude ppm (toward-zero on both
    * engines — DuckDB `//` floors, so the division runs on |num|).
    * BIGINT envelope (round-11 advisor correction): the ppm scaling
    * multiplies the numerator by 10⁶, so the binding product is
    * 18N²·10⁶ — it crosses 2⁶³ at N ≈ 7×10⁵ docs per language, not
    * the 10⁹ a bare 18N² would allow. Past that, Spark (non-ANSI)
    * wraps silently while DuckDB throws — q267b is the widened
    * DECIMAL(38,0)/HUGEINT tier (the q246b/q248 pattern; with EVERY
    * product widened — including b = Σm² and the 2b terms, round-12 —
    * the binding 18N²·10⁶ < 10³⁸ envelope holds to N ≈ 2×10¹⁵).
    * Gate SFs are ≤ ~2×10³ docs/lang — exact with 5 orders of
    * headroom in the BIGINT tier too.
    */
  private def kappaSql(idiv: String): String = kappaSql(idiv, identity, "BIGINT")

  /** `big` wraps each overflow-prone product's first factor in a
    * widening CAST — DECIMAL(38,0) on the Spark side, HUGEINT in the
    * DuckDB oracle (the q246b/q248 discipline) — and `sumTy` is the
    * type bsum's Σm² lands in. EVERY product on the kappa ratio's
    * path routes through them (round-12, closing the round-11
    * advisor's finding that sum(m·m) and the 2·b terms stayed BIGINT,
    * which silently capped the widened tier at N ≈ 10⁹ docs/lang —
    * m ≤ 3N crosses 2⁶³/2 in m² at N ≈ 10⁹, and 2b at N ≈ 7×10⁸).
    * With identity/BIGINT the SQL is the original all-BIGINT form.
    */
  private def kappaSql(idiv: String, big: String => String, sumTy: String): String =
    s"""WITH r AS (
       |  SELECT doc_id, lang,
       |         CASE WHEN n_chars < 175 THEN 0
       |              WHEN n_chars < 419 THEN 1 ELSE 2 END AS ra,
       |         CASE WHEN (length(text) - length(replace(text, ' ', '')) + 1) < 40 THEN 0
       |              WHEN (length(text) - length(replace(text, ' ', '')) + 1) < 70 THEN 1
       |              ELSE 2 END AS rb,
       |         CASE WHEN 2 * n_chars < 9 * (length(text) - length(replace(text, ' ', '')) + 1) THEN 0
       |              WHEN 2 * n_chars < 11 * (length(text) - length(replace(text, ' ', '')) + 1) THEN 1
       |              ELSE 2 END AS rc
       |  FROM documents),
       |cat AS (
       |  SELECT doc_id, lang, cat, count(*) AS nij FROM (
       |    SELECT doc_id, lang, ra AS cat FROM r
       |    UNION ALL SELECT doc_id, lang, rb FROM r
       |    UNION ALL SELECT doc_id, lang, rc FROM r) u
       |  GROUP BY doc_id, lang, cat),
       |perdoc AS (
       |  SELECT doc_id, lang, CAST(sum(nij * nij) AS BIGINT) AS ssum
       |  FROM cat GROUP BY doc_id, lang),
       |langagg AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(CASE WHEN ssum = 9 THEN 1 ELSE 0 END) AS BIGINT) AS c9,
       |         CAST(sum(CASE WHEN ssum = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
       |         CAST(sum(CASE WHEN ssum = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
       |  FROM perdoc GROUP BY lang),
       |mj AS (
       |  SELECT lang, cat, CAST(sum(nij) AS BIGINT) AS m FROM cat GROUP BY lang, cat),
       |bsum AS (SELECT lang, CAST(sum(${big("m")} * m) AS $sumTy) AS b FROM mj GROUP BY lang)
       |SELECT la.lang, la.n_docs,
       |       la.c9 AS n_full_agree, la.c5 AS n_partial_agree, la.c3 AS n_no_agree,
       |       CAST(sign(3 * (6 * la.c9 + 2 * la.c5) * ${big("la.n_docs")} - 2 * ${big("b.b")}) AS BIGINT) *
       |         CAST(((1000000 * abs(3 * (6 * la.c9 + 2 * la.c5) * ${big("la.n_docs")} - 2 * ${big("b.b")})) $idiv
       |          nullif(18 * ${big("la.n_docs")} * la.n_docs - 2 * ${big("b.b")}, 0)) AS BIGINT) AS kappa_ppm
       |FROM langagg la JOIN bsum b ON la.lang = b.lang
       |ORDER BY la.lang""".stripMargin

  /** One MM step over the ≤|S|²-row duel relations: strength lookups
    * and the win counts join by BROADCAST, the renorm total comes back
    * as a 1-row broadcast. Package-private so PlanAuditSpec can pin
    * the broadcast-iteration claim on the step plan itself — the
    * training loop checkpoints each state, so these joins are not
    * visible in the final query's plan.
    */
  private[graft] def btStep(nij: DataFrame, wi: DataFrame, p: DataFrame): DataFrame = {
    val u = nij
      .join(broadcast(p.select(col("source").as("s1"), col("p").as("pi"))), Seq("s1"))
      .join(broadcast(p.select(col("source").as("s2"), col("p").as("pj"))), Seq("s2"))
      .join(broadcast(wi.select(col("source").as("s1"), col("wins"))), Seq("s1"))
      .groupBy(col("s1"))
      .agg(first(col("wins")).as("wins"),
           sum(col("n") / (col("pi") + col("pj"))).as("den"))
      .select(col("s1").as("source"),
        ((col("wins") + lit(1)) / col("den")).as("praw"))
    val tot = u.agg(sum(col("praw")).as("tot"))
    u.crossJoin(broadcast(tot))
      .select(col("source"), (col("praw") / col("tot")).as("p"))
  }

  /** The duel-derived relations the MM loop iterates on: symmetric
    * comparison counts nij, win counts wi, and the uniform start p0.
    * Package-private for the same plan-pin reason as [[btStep]].
    */
  private[graft] def btDuelRelations(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val h = T.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        h32(col("doc_id").cast("string")).as("hv"))
      .withColumn("bucket", col("hv") % BT_BUCKETS)
    val w = Window.partitionBy(col("bucket")).orderBy(col("hv"), col("doc_id"))
    val rk = h.withColumn("rn", row_number().over(w))
    val a = rk.select(col("bucket").as("bk"), col("rn").as("ra"),
      col("doc_id").as("d1"), col("source").as("s1d"), col("n_chars").as("c1"))
    val b = rk.select(col("bucket").as("bk2"), col("rn").as("rb"),
      col("doc_id").as("d2"), col("source").as("s2d"), col("n_chars").as("c2"))
    val pairs = a.join(b, col("bk") === col("bk2") &&
      (col("rb") === col("ra") + 1 || col("rb") === col("ra") + 2))
    val winFirst = col("c1") > col("c2") ||
      (col("c1") === col("c2") && col("d1") < col("d2"))
    val duels = pairs.filter(col("s1d") =!= col("s2d"))
      .select(when(winFirst, col("s1d")).otherwise(col("s2d")).as("ws"),
              when(winFirst, col("s2d")).otherwise(col("s1d")).as("ls"))
    val wl = duels.groupBy(col("ws"), col("ls")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    // nij and wi are ≤|S|²-row relations built ONCE and re-read every
    // MM iteration (and in the final report join) — checkpointing them
    // cuts the union/distinct/outer-join lineage out of every
    // iteration and makes the broadcast-only iteration claim literal
    // in btStep's plan (pinned in PlanAuditSpec).
    val nij = wl.select(col("ws").as("s1"), col("ls").as("s2"), col("n"))
      .unionByName(wl.select(col("ls").as("s1"), col("ws").as("s2"), col("n")))
      .groupBy(col("s1"), col("s2")).agg(sum(col("n")).as("n"))
      .localCheckpoint(true)
    val wi = nij.select(col("s1").as("source")).distinct()
      .join(wl.select(col("ws").as("source"), col("n")), Seq("source"), "left_outer")
      .groupBy(col("source")).agg(coalesce(sum(col("n")), lit(0L)).as("wins"))
      .localCheckpoint(true)
    val p0 = wi.select(col("source"), lit(1.0).as("p")).localCheckpoint(true)
    (nij, wi, p0)
  }

  /** The Bradley-Terry chain up to the UNROUNDED strengths — public so
    * the spec can audit the distance of every strength to its
    * round-4 boundary (the same role VectorOpsSpec's margin audits
    * play for the kmeans oracles: the per-source Σ_j n_ij/(p_i+p_j)
    * and the normalizing Σ praw merge in engine-specific order, so the
    * doubles agree only to O(ulp); the audit shows every rounded digit
    * sits far from a boundary).
    *
    * Duels: each doc meets its next TWO neighbors in md5 order inside
    * its md5%B bucket (the q211 sorted-neighborhood shape — O(N)
    * comparisons, bucket-bounded windows); the longer document wins
    * (n_chars, doc_id tiebreak — all-integer, engine-exact). Duels
    * between same-source docs are dropped. MM updates with add-one win
    * smoothing — (W_i + 1)/Σ_j n_ij/(p_i+p_j), renormalized to sum 1
    * each step — the α=1 pseudo-count regularizer that keeps every
    * strength strictly positive, so no 0/0 corner exists for engines
    * to disagree on. wl (the ≤|S|² duel-count relation) is eagerly
    * checkpointed: the corpus scan and the bucket window run ONCE, and
    * the BT_ITERS iterations touch only broadcast-sized relations
    * ([[btStep]], plan-pinned in PlanAuditSpec).
    */
  def btStrengths(s: SparkSession, d: String): DataFrame = {
    val (nij, wi, p0) = btDuelRelations(s, d)
    var p = p0
    for (_ <- 1 to BT_ITERS)
      p = btStep(nij, wi, p).localCheckpoint(true)
    val ncomp = nij.groupBy(col("s1")).agg(sum(col("n")).as("n_comps"))
      .select(col("s1").as("source"), col("n_comps"))
    wi.join(ncomp, Seq("source")).join(p, Seq("source"))
      .select(col("source"), col("wins").as("n_wins"), col("n_comps"), col("p"))
  }

  val queries: Map[String, Q] = Map(
    // Fleiss' kappa per language over the 3-rater quality ensemble —
    // see [[kappaSql]] for the raters and the exact integer ratio.
    // Measured ~0.21-0.30 at the gate SFs: the length-family
    // heuristics agree moderately beyond chance, which is precisely
    // the "cheap raters are correlated but not interchangeable"
    // answer a curation pipeline needs before trusting any of them
    // alone.
    "q267_rater_agreement" -> ((s, d) => {
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(kappaSql("div"))
    }),

    // Production ppm tier of q267 (round-11, the q246b/q248 overflow
    // discipline, closing the advisor's envelope finding for real
    // instead of just documenting it): identical raters and identical
    // exact kappa ratio, with EVERY overflow-prone product widened to
    // DECIMAL(38,0) — the aN products, b = Σm² itself, and the 2b
    // terms (round-12: the round-11 advisor found sum(m·m) and 2·b
    // still BIGINT, capping the tier at N ≈ 10⁹) — so the binding
    // 18N²·10⁶ product now overflows at N ≈ 2×10¹⁵ docs/lang instead
    // of ~7×10⁵. Only BIGINT columns
    // ship (`div` on decimals yields LONG); the DuckDB oracle mirrors
    // via native HUGEINT. Spec asserts row-for-row equality to q267
    // at the gate SF (the values are exact integers in both tiers).
    "q267b_rater_agreement_wide" -> ((s, d) => {
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(kappaSql("div", e => s"CAST($e AS DECIMAL(38,0))", "DECIMAL(38,0)"))
    }),

    // Bradley-Terry strength per source from length-preference duels.
    // On the synthetic corpus sources are i.i.d., so the fitted
    // strengths correctly cluster near 1/|S| = 0.05 (spread is duel
    // sampling noise) — the honest null result, same posture as
    // q266's recall-neutral rotation: the audited machinery is the
    // deliverable, the flat answer is the truth on this data.
    "q268_source_bt_strength" -> ((s, d) =>
      btStrengths(s, d)
        .select(col("source"), col("n_wins"), col("n_comps"),
          round(col("p"), 4).as("bt_strength_4"))
        .orderBy(col("source")))
  )

  private lazy val btIterSql: String = {
    val its = (1 to BT_ITERS).map { t =>
      val prev = s"p${t - 1}"
      s"""u$t AS (
         |  SELECT n.s1 AS source, any_value(w.wins) AS wins,
         |         (any_value(w.wins) + 1) / sum(n.n / (pi.p + pj.p)) AS praw
         |  FROM nij n JOIN $prev pi ON n.s1 = pi.source
         |             JOIN $prev pj ON n.s2 = pj.source
         |             JOIN wi w ON n.s1 = w.source
         |  GROUP BY n.s1),
         |p$t AS (SELECT source, praw / (SELECT sum(praw) FROM u$t) AS p FROM u$t)""".stripMargin
    }
    its.mkString(",\n")
  }

  val oracle: Map[String, String] = Map(
    "q267_rater_agreement" -> kappaSql("//"),

    // HUGEINT mirror of the DECIMAL(38,0) widening; only BIGINT ships.
    "q267b_rater_agreement_wide" ->
      kappaSql("//", e => s"CAST($e AS HUGEINT)", "HUGEINT"),

    // The duel sample, counts and the 3 MM iterations replayed
    // verbatim: same md5 coin, same bucket/rank/neighbor pairing,
    // same integer win rule, same add-one smoothing and per-step
    // normalization. Per-source float sums may associate differently
    // than Spark's — PreferenceOpsSpec's boundary audit shows every
    // rounded digit is far from a .00005 edge.
    "q268_source_bt_strength" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, n_chars,
         |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
         |  FROM documents),
         |rk AS (
         |  SELECT doc_id, source, n_chars, hv, hv % $BT_BUCKETS AS bucket,
         |         row_number() OVER (PARTITION BY hv % $BT_BUCKETS ORDER BY hv, doc_id) AS rn
         |  FROM h),
         |pairs AS (
         |  SELECT a.doc_id AS d1, a.source AS s1d, a.n_chars AS c1,
         |         b.doc_id AS d2, b.source AS s2d, b.n_chars AS c2
         |  FROM rk a JOIN rk b ON a.bucket = b.bucket
         |                     AND (b.rn = a.rn + 1 OR b.rn = a.rn + 2)),
         |duels AS (
         |  SELECT CASE WHEN c1 > c2 OR (c1 = c2 AND d1 < d2) THEN s1d ELSE s2d END AS ws,
         |         CASE WHEN c1 > c2 OR (c1 = c2 AND d1 < d2) THEN s2d ELSE s1d END AS ls
         |  FROM pairs WHERE s1d <> s2d),
         |wl AS MATERIALIZED (SELECT ws, ls, count(*) AS n FROM duels GROUP BY ws, ls),
         |nij AS MATERIALIZED (
         |  SELECT s1, s2, CAST(sum(n) AS BIGINT) AS n FROM (
         |    SELECT ws AS s1, ls AS s2, n FROM wl
         |    UNION ALL SELECT ls, ws, n FROM wl) u2
         |  GROUP BY s1, s2),
         |wi AS MATERIALIZED (
         |  SELECT s.source, CAST(coalesce(sum(wl.n), 0) AS BIGINT) AS wins
         |  FROM (SELECT DISTINCT s1 AS source FROM nij) s
         |  LEFT JOIN wl ON wl.ws = s.source GROUP BY s.source),
         |p0 AS (SELECT source, CAST(1 AS DOUBLE) AS p FROM wi),
         |$btIterSql,
         |ncomp AS (SELECT s1 AS source, CAST(sum(n) AS BIGINT) AS n_comps
         |          FROM nij GROUP BY s1)
         |SELECT w.source, w.wins AS n_wins, nc.n_comps,
         |       round(p$BT_ITERS.p, 4) AS bt_strength_4
         |FROM wi w JOIN ncomp nc ON w.source = nc.source
         |     JOIN p$BT_ITERS ON p$BT_ITERS.source = w.source
         |ORDER BY w.source""".stripMargin
  )
}
