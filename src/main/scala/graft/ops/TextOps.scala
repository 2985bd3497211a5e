package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table — north-star
  * extensions for training-data pipelines (language ID, quality scoring,
  * token counting, fingerprinting).
  *
  * q70/q71 are written once as engine-neutral ANSI SQL (only length /
  * replace / CASE / arithmetic, identical semantics in Spark SQL and
  * DuckDB) and executed via spark.sql over a temp view — the operator
  * IS its oracle text, which removes dialect-drift risk entirely. All
  * are single-pass projections: at 100 TB they pipeline inside the scan
  * with no shuffle (the final ORDER BY is presentation-only).
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Marker-word language ID, engine-neutral SQL. Counts occurrences of
    * per-language stopword markers by padded replace-shrinkage (the
    * count is (len-len_after)/(marker_len-1); non-overlapping replace
    * semantics are identical in both engines). Deterministic argmax with
    * fixed precedence de<en<es<fr<zh on ties.
    */
  private val langIdSql =
    """SELECT doc_id,
      | CAST((length(p) - length(replace(p, ' der ', ' '))) / 4
      |    + (length(p) - length(replace(p, ' und ', ' '))) / 4 AS INT) AS s_de,
      | CAST((length(p) - length(replace(p, ' the ', ' '))) / 4
      |    + (length(p) - length(replace(p, ' and ', ' '))) / 4 AS INT) AS s_en,
      | CAST((length(p) - length(replace(p, ' el ', ' '))) / 3
      |    + (length(p) - length(replace(p, ' que ', ' '))) / 4 AS INT) AS s_es,
      | CAST((length(p) - length(replace(p, ' le ', ' '))) / 3
      |    + (length(p) - length(replace(p, ' et ', ' '))) / 3 AS INT) AS s_fr,
      | CAST(length(p) - length(replace(p, '的', '')) AS INT) AS s_zh,
      | CASE
      |  WHEN (length(p) - length(replace(p, ' der ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' und ', ' '))) / 4 >=
      |       (length(p) - length(replace(p, ' the ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' and ', ' '))) / 4
      |   AND (length(p) - length(replace(p, ' der ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' und ', ' '))) / 4 >=
      |       (length(p) - length(replace(p, ' el ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' que ', ' '))) / 4
      |   AND (length(p) - length(replace(p, ' der ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' und ', ' '))) / 4 >=
      |       (length(p) - length(replace(p, ' le ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' et ', ' '))) / 3
      |   AND (length(p) - length(replace(p, ' der ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' und ', ' '))) / 4 >=
      |       length(p) - length(replace(p, '的', ''))
      |  THEN 'de'
      |  WHEN (length(p) - length(replace(p, ' the ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' and ', ' '))) / 4 >=
      |       (length(p) - length(replace(p, ' el ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' que ', ' '))) / 4
      |   AND (length(p) - length(replace(p, ' the ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' and ', ' '))) / 4 >=
      |       (length(p) - length(replace(p, ' le ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' et ', ' '))) / 3
      |   AND (length(p) - length(replace(p, ' the ', ' '))) / 4
      |     + (length(p) - length(replace(p, ' and ', ' '))) / 4 >=
      |       length(p) - length(replace(p, '的', ''))
      |  THEN 'en'
      |  WHEN (length(p) - length(replace(p, ' el ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' que ', ' '))) / 4 >=
      |       (length(p) - length(replace(p, ' le ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' et ', ' '))) / 3
      |   AND (length(p) - length(replace(p, ' el ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' que ', ' '))) / 4 >=
      |       length(p) - length(replace(p, '的', ''))
      |  THEN 'es'
      |  WHEN (length(p) - length(replace(p, ' le ', ' '))) / 3
      |     + (length(p) - length(replace(p, ' et ', ' '))) / 3 >=
      |       length(p) - length(replace(p, '的', ''))
      |  THEN 'fr'
      |  ELSE 'zh'
      | END AS pred_lang
      |FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** Quality scoring, engine-neutral SQL: char length, token count,
    * average word length, stopword ratio, length-band flag, and a
    * blended quality score.
    */
  // NB: exact-decimal literals (1.0) parse as DECIMAL in both Spark SQL
  // and DuckDB — every ratio below goes through CAST(... AS DOUBLE) so
  // the output schema is DOUBLE in both engines.
  private val qualitySql =
    """SELECT doc_id,
      | CAST(length(text) AS INT) AS n_char,
      | CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_tok,
      | round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |       / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_word_len,
      | round((CAST(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' ')) AS DOUBLE) / 2.0
      |      + CAST(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' ')) AS DOUBLE) / 4.0)
      |       / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS stopword_ratio,
      | CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS len_ok,
      | round(0.5 * CAST(CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS DOUBLE)
      |     + 0.5 * least(CAST(1 AS DOUBLE),
      |                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0),
      |       4) AS quality
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "q70_lang_id" -> ((s, d) => {
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(langIdSql)
    }),

    "q71_text_quality" -> ((s, d) => {
      T.documents(s, d).createOrReplaceTempView("documents")
      s.sql(qualitySql)
    }),

    // Token counting: whitespace tokens + regex word-ish tokens (the
    // BPE-style pre-tokenizer split) + density per 100 chars.
    "q72_token_count" -> ((s, d) =>
      T.documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tok"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("n_re_tok"),
          round(size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))) * 100.0 /
                length(col("text")), 4).as("tok_per_100c"))
        .orderBy(col("doc_id"))),

    // Content fingerprinting: md5 + sha256 of the normalized text, and a
    // 16-hex-char short fingerprint for bucketing.
    "q73_fingerprint" -> ((s, d) =>
      T.documents(s, d)
        .select(
          col("doc_id"),
          md5(col("text")).as("fp_md5"),
          sha2(col("text"), 256).as("fp_sha256"),
          substring(md5(lower(trim(col("text")))), 1, 16).as("fp_short"))
        .orderBy(col("doc_id"))),

    // CCNet-style fluency proxy: per-doc mean unigram log-probability
    // under the corpus's own unigram model — the cheap stand-in for LM
    // perplexity filtering when no external model is available. Shapes:
    // token explode (projection), vocabulary-keyed count agg, ONE
    // scalar broadcast (corpus token total), token⋈vocab join keyed by
    // the vocabulary (same posture as q84's tf-idf), doc-keyed avg.
    // keep splits at a fixed ln-prob threshold (−3.6 sits in a gap of
    // the score distribution ≥0.019 wide at both test SFs, so the flag
    // is robust to cross-engine ULP drift; the score itself is an avg
    // of logs — noisy doubles, safe to round).
    "q91_unigram_logprob" -> ((s, d) => {
      val tok = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val n = vocab.agg(sum(col("c")).cast("double").as("n"))
      tok.join(vocab, "w").crossJoin(broadcast(n))
        .groupBy(col("doc_id"))
        .agg(avg(log(col("c").cast("double") / col("n"))).as("lp"))
        .select(col("doc_id"), round(col("lp"), 4).as("logprob"),
          when(col("lp") >= -3.6, 1).otherwise(0).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Lexical diversity: type-token ratio and hapax rate per doc — the
    // classic gibberish/boilerplate signals. Ratios are emitted in
    // basis points via exact INTEGER division ((10000·a) div b): a
    // small-denominator rational rounded to 4 decimals can land
    // exactly on the .xxxx5 engine-disagreement boundary (7/32 =
    // 0.21875), so no float rounding touches these columns at all.
    "q92_lexical_diversity" -> ((s, d) => {
      val cw = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cw"))
      cw.groupBy(col("doc_id"))
        .agg(sum(col("cw")).as("n_tok"),
             count(lit(1)).as("n_types"),
             sum(when(col("cw") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("doc_id"),
          col("n_tok").cast("long").as("n_tok"), col("n_types"), col("n_hapax"),
          expr("(10000 * n_types) div n_tok").as("ttr_bp"),
          expr("(10000 * n_hapax) div n_types").as("hapax_bp"))
        .orderBy(col("doc_id"))
    }),

    // Token burstiness (variance-to-mean ratio over per-doc counts,
    // zeros included) — Church's classic content-word detector: a
    // function word scatters ~Poisson (VMR ≈ 1), a topical word
    // arrives in bursts (VMR ≫ 1). The algebra keeps it integer:
    // VMR = S2/T − T/N over exact sums (S2 = Σc², T = Σc, N docs),
    // emitted in ppm via the SAME floored-division expression both
    // engines evaluate — zero-count docs enter through the algebra,
    // never through a dense (doc × token) relation. Shuffles: the
    // (doc,w) count and the vocabulary-keyed rollup, nothing else.
    "q245_token_burstiness" -> ((s, d) => {
      val cw = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      val stats = cw.groupBy(col("w"))
        .agg(count(lit(1)).as("df"), sum(col("c")).as("tf"),
             sum(col("c") * col("c")).as("s2"))
      val top = broadcast(stats.orderBy(col("df").desc, col("w")).limit(20))
      val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
      top.crossJoin(broadcast(n))
        .select(col("w"), col("df"), col("tf"),
          expr("(1000000 * s2) div tf - (1000000 * tf) div n_docs").as("vmr_ppm"))
        .withColumn("kind",
          when(col("vmr_ppm") > 1500000, "bursty").otherwise("flat"))
        .orderBy(col("w"))
    }),

    // Per-doc unigram Shannon entropy (nats) — the information-density
    // gibberish/boilerplate gate next to q92's TTR: near-zero entropy
    // is one token repeated (boilerplate), maximal entropy at equal
    // n_tok is all-distinct word soup. Uses the rearrangement
    // H = ln n − (Σ c·ln c)/n so the agg is one partial-aggregable
    // (doc,w) count followed by a doc-keyed sum — one log per TYPE,
    // never per token occurrence. Entropy is a sum of noisy log terms
    // → rounded; n_tok/n_types ship exact.
    "q227_token_entropy" -> ((s, d) => {
      val cw = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cw"))
      cw.groupBy(col("doc_id"))
        .agg(sum(col("cw")).cast("long").as("n_tok"),
             count(lit(1)).as("n_types"),
             sum(col("cw").cast("double") * log(col("cw").cast("double"))).as("slc"))
        .select(col("doc_id"), col("n_tok"), col("n_types"),
          round(log(col("n_tok").cast("double")) - col("slc") / col("n_tok"), 4)
            .as("entropy4"))
        .orderBy(col("doc_id"))
    }),

    // Corpus token histogram via explode (the UDTF/lateral surface —
    // SURVEY §2.2: explode/posexplode stand in for generators). The
    // explode is a projection; the only shuffle is the token groupBy,
    // whose cardinality is the vocabulary — tiny at any corpus scale.
    // n = term frequency, doc_freq = document frequency (the IDF
    // denominator a training pipeline actually wants).
    "q78_token_histogram" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("doc_freq"))
        .orderBy(col("w")))
  ) ++ Map[String, Q](

    // Bigram-LM fluency (the step up from q91's unigram score): per-doc
    // mean of ln P(w_i | w_{i-1}) under corpus MLE estimates, where
    // P(w2|w1) = c(w1 w2) / c(w1·) — prefix counts from the bigram
    // relation itself, so the conditional sums to 1 exactly. Bigram
    // extraction is a doc-keyed lead window (doc-sized partitions);
    // the two count relations are bigram-vocabulary-sized aggregates
    // joined back on vocabulary keys. The keep threshold −3.59 sits in
    // a measured gap of the score distribution at every test SF
    // (nearest doc ≥ 6e-4 away — float noise can't flip it).
    "q107_bigram_fluency" -> ((s, d) => {
      val tok = T.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val big = tok.withColumn("w2", lead(col("w"), 1).over(wd))
        .filter(col("w2").isNotNull)
        .select(col("doc_id"), col("w").as("w1"), col("w2"))
      val bc = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val uc = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      big.join(bc, Seq("w1", "w2")).join(uc, Seq("w1"))
        .groupBy(col("doc_id"))
        .agg(avg(log(col("c2").cast("double") / col("c1"))).as("lp"))
        .select(col("doc_id"), round(col("lp"), 4).as("bigram_lp"),
          when(col("lp") >= -3.59, 1).otherwise(0).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary coverage curve: top-30 tokens by corpus frequency with
    // cumulative coverage in exact-integer basis points — the
    // "how small can the tokenizer vocab be" diagnostic. Ranking over
    // the (data-dependent, possibly huge) vocabulary goes through
    // ScalableRank (constant key — q98's pattern, never a single-task
    // global window); the cumulative sum then runs over the 30
    // SURVIVING rows only, a constant-size window by construction.
    "q108_vocab_coverage" -> ((s, d) => {
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val vc = T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .withColumn("g", lit(0))
      val tot = vc.agg(sum(col("c")).as("total"))
      val top = graft.functions.ScalableRank
        .withRanks(vc, Seq("g"), Seq(col("c").desc, col("w")),
          Seq(col("c"), col("w")), p)
        .filter(col("rn") <= 30)
      val w30 = Window.orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("c")).over(w30))
        .select(col("rn").as("rnk"), col("w"), col("c").as("n_occ"),
          expr("(10000 * cum) div total").as("cum_bp"))
        .orderBy(col("rnk"))
    }),

    // Tokenizer fertility (the per-language cost metric a tokenizer
    // report tracks): BPE-ish regex tokens per whitespace word
    // (fertility) and characters per regex token, rolled up by lang.
    // Pure projection + one lang-keyed agg — the per-doc token counts
    // partial-aggregate map-side, so the shuffle carries |langs| rows.
    // Ratios are permille floors (ints), never rounded floats.
    "q114_tokenizer_fertility" -> ((s, d) =>
      T.documents(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_bpe"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ws")).as("ws_tokens"),
          sum(col("n_bpe")).as("bpe_tokens"))
        .withColumn("fertility_permille",
          floor(lit(1000.0) * col("bpe_tokens") / col("ws_tokens")).cast("int"))
        .orderBy(col("lang"))),

    // Interpolated Kneser-Ney bigram scoring — the properly-smoothed
    // LM quality filter (the CCNet/wiki-LM component q107's raw MLE
    // stands in for): P(w2|w1) = (c(w1w2) − D)/c(w1·)
    // + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··), D = 0.75 (exactly
    // representable in binary — no decimal-literal drift). What KN
    // adds over MLE: unseen-context mass goes to words in proportion
    // to how many DISTINCT contexts they follow (continuation count),
    // not raw frequency — the difference that separates fluent novel
    // text from stuffed high-frequency tokens. Every mass term is an
    // exact integer count; the only floats are the per-bigram p and
    // the final avg(ln p), rounded 4 (q107's discipline). Plan: the
    // bigram-type relation bc is built ONCE, and c1/N1+(w1·),
    // N1+(·w2), N1+(··) all DERIVE from it (three vocabulary-sized
    // aggs of an already-aggregated relation — nothing re-reads the
    // corpus); the per-token joins are vocabulary-keyed, exactly
    // q107's shape, and the grand total crosses in as one broadcast
    // row. Every bigram appears in bc so c2 ≥ 1 > D — the max(·,0)
    // clamp in the textbook form is vacuous and omitted on both
    // engines.
    "q144_kneser_ney" -> ((s, d) => {
      val big = bigrams(T.documents(s, d))
      big.join(knSeenProbs(big), Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), round(avg(log(col("p"))), 4).as("kn_lp4"))
        .orderBy(col("doc_id"))
    }),

    // Zipf rank–frequency fit — the corpus-naturalness diagnostic
    // (natural language follows f ∝ r^s with s ≈ −1; machine-generated
    // or templated corpora bend the log-log line): OLS of ln(f) on
    // ln(rank) over the top-1000 tokens, with R². The global ranking
    // of the token vocabulary is exactly the constant-key regime
    // ScalableRank exists for (q182/q183's shape — one key, the whole
    // vocabulary must not sort on one task); after the rank filter the
    // relation is ≤1000 rows and the fit is one closed-form agg. The
    // only floats are ln() of exact integer ranks/counts summed then
    // rounded 4 — q107/q144's discipline.
    "q197_zipf_fit" -> ((s, d) =>
      zipfFit(T.documents(s, d).select(explode(split(col("text"), " ")).as("w")))),

    // Heaps'-law fit — q197's companion corpus-naturalness diagnostic
    // on the GROWTH axis: vocabulary size follows V(N) ≈ K·N^β
    // (β ≈ 0.4–0.6 for natural text; templated corpora saturate, raw
    // noise stays near β = 1). Each token's first-occurrence doc is one
    // vocabulary-keyed agg; per-doc token/new-type counts then ride TWO
    // constant-key ScalableRank running sums (cumulative tokens N and
    // cumulative types V in doc order — the whole corpus is one "key",
    // exactly the regime the two-phase decomposition exists for), and
    // the log-log OLS is the same closed-form aggregate as q197.
    "q202_heaps_fit" -> ((s, d) =>
      heapsFit(T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w")))),

    // Cross-source LM transfer matrix — the mixture-design tool one
    // level above q116/q129's lexical-overlap diagnostics: train an
    // add-one-smoothed bigram model on EACH source, score EVERY
    // source's bigram stream under it (avg ln p per bigram token), and
    // report the |S|² matrix. A low off-diagonal cell means the
    // train-source's LM transfers poorly to the eval source — the
    // signal behind "does adding source T help modeling source E".
    // Plan: everything derives from ONE (source, w1, w2, count)
    // bigram-type relation (vocab²-bounded, never corpus-bounded);
    // the eval×train expansion is a broadcast cross join against the
    // |S|-row source list; per-cell scoring joins are bigram-type-
    // keyed. Add-one (not KN) because its unseen-pair form
    // (c+1)/(c1+V) is total without per-model continuation mass —
    // smoothing quality is q144's concern, transfer GEOMETRY is this
    // one's. Floats: only the final ln, summed then rounded 4
    // (q144's discipline).
    "q208_crosssource_perplexity" -> ((s, d) => {
      val docs = T.documents(s, d)
      val src = docs.select(col("doc_id"), col("source"))
      val big = bigrams(docs).join(src, "doc_id")
      val ebc = big.groupBy(col("source"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("ce"))
        .withColumnRenamed("source", "src_e")
      val tbc = big.groupBy(col("source"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("ct"))
        .withColumnRenamed("source", "src_t")
      val tuc = tbc.groupBy(col("src_t"), col("w1")).agg(sum(col("ct")).as("c1"))
      val tv = big.select(col("source"), col("w1").as("w"))
        .unionByName(big.select(col("source"), col("w2").as("w")))
        .distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("v"))
        .withColumnRenamed("source", "src_t")
      ebc.crossJoin(broadcast(tv))
        .join(tbc, Seq("src_t", "w1", "w2"), "left_outer")
        .join(tuc, Seq("src_t", "w1"), "left_outer")
        .select(col("src_e"), col("src_t"), col("ce"),
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v"))).as("p"))
        .groupBy(col("src_e"), col("src_t"))
        .agg(sum(col("ce")).as("n_bigrams"),
             round(sum(col("ce") * log(col("p"))) / sum(col("ce")), 4).as("avg_lp"))
        .orderBy(col("src_e"), col("src_t"))
    }),

    // CCNet head/middle/tail partition (Wenzek et al. 2020): per
    // LANGUAGE, rank documents by LM score (per-doc mean unigram
    // ln-prob under the corpus model — q91's fluency proxy) and cut
    // into exact-integer terciles; CCNet trains on 'head', holds out
    // 'tail'. Plan shape: one token explode, a vocabulary-keyed count
    // agg, ONE broadcast scalar, a doc-keyed avg — then the per-lang
    // float ranking rides ScalableRank (lang is a low-card key, the
    // q31 trap) and the cuts are integer comparisons rn·3 ≤ ntot /
    // rn·3 ≤ 2·ntot. Rank-boundary margins audited in CorpusOpsSpec
    // ("CCNet buckets" test; avg-of-logs drift is ~1e-14, boundary
    // gaps measured far wider).
    "q279_ccnet_buckets" -> ((s, d) => {
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val tok = T.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val n = vocab.agg(sum(col("c")).cast("double").as("n"))
      val lp = tok.join(vocab, "w").crossJoin(broadcast(n))
        .groupBy(col("doc_id"), col("lang"))
        .agg(avg(log(col("c").cast("double") / col("n"))).as("lp"))
      graft.functions.ScalableRank.withRanks(lp, Seq("lang"),
          Seq(col("lp").desc, col("doc_id")),
          Seq(col("lp"), col("doc_id")), p)
        .select(col("doc_id"), col("lang"), round(col("lp"), 4).as("lp_4"),
          when(col("rn") * 3 <= col("ntot"), "head")
            .when(col("rn") * 3 <= col("ntot") * 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    })
  )

  /** Heaps'-law growth fit over a (doc_id, w) token relation — see the
    * q202 entry above for the operator rationale and scale notes.
    */
  def heapsFit(toks: DataFrame): DataFrame = {
    val per = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val nw = toks.groupBy(col("w")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_new"))
    val base = per.join(nw, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("g", lit(1))
    val c1 = graft.functions.ScalableRank
      .withRunningSum(base, Seq("g"), Seq(col("doc_id")), col("n_tok"), 32)
      .withColumnRenamed("rsum", "cn")
    val c2 = graft.functions.ScalableRank
      .withRunningSum(c1, Seq("g"), Seq(col("doc_id")), col("n_new"), 32)
      .withColumnRenamed("rsum", "cv")
    olsFit(c2.select(log(col("cn").cast("double")).as("x"),
                     log(col("cv").cast("double")).as("y")))
      .withColumnRenamed("n_pts", "n_docs")
      .orderBy(col("n_docs"))
  }

  /** OLS of ln(frequency) on ln(rank) over the top-1000 tokens of a
    * one-column (`w`) token relation — see the q197 entry above for
    * the operator rationale and scale notes.
    */
  def zipfFit(tokens: DataFrame): DataFrame = {
    val freq = tokens
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .withColumn("g", lit(1))
    olsFit(graft.functions.ScalableRank
      .withRanks(freq, Seq("g"), Seq(col("f").desc, col("w")),
        Seq(col("f"), col("w")), 32)
      .filter(col("rn") <= 1000)
      .select(log(col("rn").cast("double")).as("x"),
              log(col("f").cast("double")).as("y")))
      .withColumnRenamed("n_pts", "n_top")
      .orderBy(col("n_top"))
  }

  /** Closed-form simple OLS over an (x, y) point relation: one
    * partial-aggregable moment pass, then slope/intercept/R² by the
    * normal equations — shared by the q197/q202 log-log fits.
    */
  def olsFit(xy: DataFrame): DataFrame =
    xy.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").as("n_pts"),
        round(expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)"), 4).as("slope"),
        round(expr("(sy * sxx - sx * sxy) / (n * sxx - sx * sx)"), 4).as("intercept"),
        round(expr("(n * sxy - sx * sy) * (n * sxy - sx * sy)" +
          " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"), 4).as("r2"))

  /** Per-token bigram relation (doc_id, w1, w2) — doc-keyed lead
    * window, doc-sized partitions (q107's extraction).
    */
  def bigrams(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    tok.withColumn("w2", lead(col("w"), 1).over(wd))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w").as("w1"), col("w2"))
  }

  /** KN model over the SEEN bigram types: one row per (w1, w2) with
    * the exact integer masses (c2, c1, n1f, n1b, nt) and the smoothed
    * p. Unseen-pair mass is the closed form λ(w1)·Pcont(w2) =
    * (D·n1f/c1)·(n1b/nt) over the same masses — KNSpec uses it to
    * assert Σ_w2 P(w2|w1) = 1 per context, the property that makes
    * this a probability model and not a score.
    */
  def knSeenProbs(big: DataFrame): DataFrame = {
    val bc = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val uc = bc.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val cont = bc.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val tot = broadcast(bc.agg(count(lit(1)).as("nt")))
    bc.join(uc, Seq("w1")).join(cont, Seq("w2")).crossJoin(tot)
      .withColumn("p",
        (col("c2").cast("double") - 0.75) / col("c1") +
          (lit(0.75) * col("n1f") / col("c1")) * (col("n1b").cast("double") / col("nt")))
  }

  val oracle: Map[String, String] = Map(
    "q70_lang_id" -> langIdSql,
    "q71_text_quality" -> qualitySql,

    "q107_bigram_fluency" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
        |         generate_subscripts(string_split(text,' '),1) AS i
        |  FROM documents
        |), big AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |), bc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1,2),
        |uc AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
        |s AS (
        |  SELECT doc_id, avg(ln(CAST(c2 AS DOUBLE)/c1)) AS lp
        |  FROM big JOIN bc USING (w1,w2) JOIN uc USING (w1)
        |  GROUP BY doc_id
        |)
        |SELECT doc_id, round(lp,4) AS bigram_lp,
        |       CASE WHEN lp >= -3.59 THEN 1 ELSE 0 END AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "q108_vocab_coverage" ->
      """WITH vc AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(string_split(text,' ')) AS w FROM documents) GROUP BY 1
        |), t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vc),
        |r AS (
        |  SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rnk,
        |         CAST(sum(c) OVER (ORDER BY c DESC, w
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM vc
        |)
        |SELECT rnk, w, CAST(c AS BIGINT) AS n_occ, (10000 * cum) // t.total AS cum_bp
        |FROM r, t WHERE rnk <= 30 ORDER BY rnk""".stripMargin,

    "q91_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |), vocab AS (
        |  SELECT w, count(*) AS c FROM tok GROUP BY 1
        |), n AS (
        |  SELECT CAST(sum(c) AS DOUBLE) AS n FROM vocab
        |), s AS (
        |  SELECT doc_id, avg(ln(CAST(c AS DOUBLE) / n.n)) AS lp
        |  FROM tok JOIN vocab USING (w), n GROUP BY doc_id
        |)
        |SELECT doc_id, round(lp, 4) AS logprob,
        |       CASE WHEN lp >= -3.6 THEN 1 ELSE 0 END AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "q92_lexical_diversity" ->
      """WITH cw AS (
        |  SELECT doc_id, w, count(*) AS cw
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |       CAST(sum(cw) AS BIGINT) AS n_tok,
        |       count(*) AS n_types,
        |       CAST(sum(CASE WHEN cw = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |       (10000 * count(*)) // CAST(sum(cw) AS BIGINT) AS ttr_bp,
        |       (10000 * CAST(sum(CASE WHEN cw = 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS hapax_bp
        |FROM cw GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q245_token_burstiness" ->
      """WITH cw AS (
        |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2
        |), stats AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS df,
        |         CAST(sum(c) AS BIGINT) AS tf,
        |         CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM cw GROUP BY 1
        |), top AS (SELECT * FROM stats ORDER BY df DESC, w LIMIT 20),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT w, df, tf,
        |       (1000000 * s2) // tf - (1000000 * tf) // n_docs AS vmr_ppm,
        |       CASE WHEN (1000000 * s2) // tf - (1000000 * tf) // n_docs > 1500000
        |            THEN 'bursty' ELSE 'flat' END AS kind
        |FROM top CROSS JOIN n ORDER BY w""".stripMargin,

    "q227_token_entropy" ->
      """WITH cw AS (
        |  SELECT doc_id, w, count(*) AS cw
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |       CAST(sum(cw) AS BIGINT) AS n_tok,
        |       count(*) AS n_types,
        |       round(ln(CAST(sum(cw) AS DOUBLE))
        |             - sum(CAST(cw AS DOUBLE) * ln(CAST(cw AS DOUBLE)))
        |               / CAST(sum(cw) AS BIGINT), 4) AS entropy4
        |FROM cw GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q72_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tok,
        | CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_re_tok,
        | round(len(regexp_extract_all(text, '[a-z0-9]+')) * 100.0 / length(text), 4) AS tok_per_100c
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q73_fingerprint" ->
      """SELECT doc_id,
        | md5(text) AS fp_md5,
        | sha256(text) AS fp_sha256,
        | substr(md5(lower(trim(text))), 1, 16) AS fp_short
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q114_tokenizer_fertility" ->
      """WITH t AS (
        |  SELECT lang, CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |           AS n_bpe
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
        |       CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
        |       CAST(floor(1000.0 * sum(n_bpe) / sum(n_ws)) AS INT) AS fertility_permille
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "q78_token_histogram" ->
      """SELECT w, count(*) AS n, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |GROUP BY w ORDER BY w""".stripMargin,

    "q144_kneser_ney" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
        |         generate_subscripts(string_split(text,' '),1) AS i
        |  FROM documents
        |), big AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |), bc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
        |uc AS (
        |  SELECT w1, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS n1f
        |  FROM bc GROUP BY 1
        |), cont AS (SELECT w2, count(*) AS n1b FROM bc GROUP BY 1),
        |tot AS (SELECT count(*) AS nt FROM bc)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       round(avg(ln(
        |         (CAST(c2 AS DOUBLE) - 0.75) / c1 +
        |         (0.75 * CAST(n1f AS DOUBLE) / c1) * (CAST(n1b AS DOUBLE) / nt))), 4) AS kn_lp4
        |FROM big JOIN bc USING (w1, w2) JOIN uc USING (w1)
        |     JOIN cont USING (w2) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q197_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |), freq AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY 1
        |), rk AS (
        |  SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r FROM freq
        |), top AS (
        |  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
        |  FROM rk WHERE r <= 1000
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM top
        |)
        |SELECT n AS n_top,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
        |       round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 4) AS intercept,
        |       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
        |FROM s
        |ORDER BY n_top""".stripMargin,

    "q202_heaps_fit" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |), per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY 1
        |), fd AS (
        |  SELECT w, min(doc_id) AS doc_id FROM tok GROUP BY 1
        |), nw AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new FROM fd GROUP BY 1
        |), cum AS (
        |  SELECT p.doc_id,
        |         CAST(sum(p.n_tok) OVER (ORDER BY p.doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |         CAST(sum(coalesce(nw.n_new, 0)) OVER (ORDER BY p.doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cv
        |  FROM per p LEFT JOIN nw USING (doc_id)
        |), pts AS (
        |  SELECT ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y FROM cum
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM pts
        |)
        |SELECT n AS n_docs,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
        |       round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 4) AS intercept,
        |       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
        |FROM s
        |ORDER BY n_docs""".stripMargin,

    "q208_crosssource_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS i
        |  FROM documents
        |), big0 AS (
        |  SELECT a.source, a.w AS w1, b.w AS w2
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |), ebc AS (
        |  SELECT source AS src_e, w1, w2, CAST(count(*) AS BIGINT) AS ce
        |  FROM big0 GROUP BY 1, 2, 3
        |), tbc AS (
        |  SELECT source AS src_t, w1, w2, CAST(count(*) AS BIGINT) AS ct
        |  FROM big0 GROUP BY 1, 2, 3
        |), tuc AS (
        |  SELECT src_t, w1, CAST(sum(ct) AS BIGINT) AS c1 FROM tbc GROUP BY 1, 2
        |), tv AS (
        |  SELECT source AS src_t, CAST(count(*) AS BIGINT) AS v FROM (
        |    SELECT DISTINCT source, w FROM (
        |      SELECT source, w1 AS w FROM big0
        |      UNION ALL SELECT source, w2 AS w FROM big0))
        |  GROUP BY 1
        |), cell AS (
        |  SELECT ebc.src_e, tv.src_t, ebc.ce,
        |         CAST(coalesce(tbc.ct, 0) + 1 AS DOUBLE)
        |           / (coalesce(tuc.c1, 0) + tv.v) AS p
        |  FROM ebc CROSS JOIN tv
        |  LEFT JOIN tbc ON tbc.src_t = tv.src_t AND tbc.w1 = ebc.w1 AND tbc.w2 = ebc.w2
        |  LEFT JOIN tuc ON tuc.src_t = tv.src_t AND tuc.w1 = ebc.w1
        |)
        |SELECT src_e, src_t, CAST(sum(ce) AS BIGINT) AS n_bigrams,
        |       round(sum(ce * ln(p)) / sum(ce), 4) AS avg_lp
        |FROM cell GROUP BY 1, 2
        |ORDER BY src_e, src_t""".stripMargin,

    // q91's unigram model + the per-lang rank and the exact-integer
    // tercile cuts replayed.
    "q279_ccnet_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, w
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE w <> ''
        |), voc AS (
        |  SELECT w, count(*) AS c FROM tok GROUP BY 1
        |), nn AS (
        |  SELECT CAST(sum(c) AS DOUBLE) AS n FROM voc
        |), lp AS (
        |  SELECT t.doc_id, t.lang, avg(ln(CAST(v.c AS DOUBLE) / nn.n)) AS lp
        |  FROM tok t JOIN voc v USING (w) CROSS JOIN nn GROUP BY 1, 2
        |), rk AS (
        |  SELECT doc_id, lang, lp,
        |         row_number() OVER (PARTITION BY lang ORDER BY lp DESC, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS ntot
        |  FROM lp
        |)
        |SELECT doc_id, lang, round(lp, 4) AS lp_4,
        |       CASE WHEN rn * 3 <= ntot THEN 'head'
        |            WHEN rn * 3 <= ntot * 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM rk ORDER BY doc_id""".stripMargin
  )
}
