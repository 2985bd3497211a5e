package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-similarity building blocks for the dedup operator family
  * (north-star extensions; the reference has no analog — its only
  * "function" is the type-map switch at /root/reference/main.go:131-148).
  *
  * Everything is expressed over DataFrame columns with higher-order
  * functions and hash() — no UDFs — so the whole pipeline stays inside
  * whole-stage codegen and scales by partitioning:
  *  - shingling is a per-row transform (no shuffle);
  *  - pair generation shuffles on the shingle/band value, which is the
  *    LSH trick that replaces the O(n²) cross join at 100 TB;
  *  - exact verification only touches candidate pairs (a semi-join-sized
  *    input), never the full pair space.
  */
object TextSim {

  /** SQL expression producing the array of word n-grams over a token
    * array column `ws` (empty array when the doc is shorter than n) —
    * the single source of gram semantics shared by [[shingles]] and
    * the positional/bag variants in CorpusOps.
    */
  def gramArrayExpr(n: Int, wsCol: String = "ws"): String =
    s"""CASE WHEN size($wsCol) < $n THEN array()
       |ELSE transform(sequence(0, size($wsCol)-$n), i -> concat_ws(' ', slice($wsCol, i+1, $n)))
       |END""".stripMargin

  /** Word n-gram shingles, one row per distinct (doc_id, shingle). */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(array_distinct(expr(gramArrayExpr(n)))).as("g"))

  /** All-pairs n-gram Jaccard via shingle-equality join (exact).
    * Output: id1 < id2, jaccard rounded to 4.
    *
    * Scale note: the join key is the shingle value, so cost is
    * Σ_g m_g² over shingle frequencies — fine for mostly-unique
    * shingles, quadratic for stop-shingles. The MinHash/SimHash
    * variants below are the 100 TB path; this exact form doubles as
    * their verification oracle.
    */
  def jaccardPairs(sh: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("x")
      .join(sh.as("y"), col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, sizes, minJaccard)
  }

  /** Exact-verify candidate pairs (id1, id2) against true n-gram Jaccard.
    * Joins shingles only for candidate docs — the post-LSH step.
    */
  def verifyJaccard(cand: DataFrame, sh: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("id1"), col("g").as("g1"))
    val b = sh.select(col("doc_id").as("cid2"), col("g").as("g2"))
    val inter = cand
      .join(a, "id1")
      .join(b, col("id2") === col("cid2") && col("g1") === col("g2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, sizes, minJaccard)
  }

  private def withJaccard(inter: DataFrame, sizes: DataFrame, minJ: Double): DataFrame = {
    val s1 = sizes.select(col("doc_id").as("id1"), col("n").as("n1"))
    val s2 = sizes.select(col("doc_id").as("id2"), col("n").as("n2"))
    inter.join(s1, "id1").join(s2, "id2")
      .withColumn("jacc", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jacc") >= minJ)
      .select(col("id1"), col("id2"), round(col("jacc"), 4).as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  // ---------------- MinHash ----------------

  /** Prime modulus for the universal hash family (2^31 - 1, so that
    * a*x+b stays within Long without overflow: a,x < 2^31 → a*x < 2^62).
    */
  private val P = 2147483647L

  /** Deterministic (a,b) coefficients, seed 42 — shared with the native
    * kernel ([[MinHashWords]]) so all three signature forms agree bit
    * for bit.
    */
  private[graft] def coefficients(nHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nHashes)((1L + rnd.nextInt((P - 1).toInt).toLong, rnd.nextInt(P.toInt).toLong))
  }

  /** MinHash signature: one row per doc, columns h0..h{n-1}.
    * Base hash = murmur3(shingle) (Spark's hash(), seed fixed), lifted
    * to [0, P). The n mins are computed in a single hash aggregate —
    * one pass over the exploded shingles, partial aggregation before
    * the shuffle.
    */
  def minhashSignature(sh: DataFrame, nHashes: Int): DataFrame = {
    val x = hash(col("g")).cast("long").bitwiseAND(lit(0xFFFFFFFFL)) % P
    val aggs = coefficients(nHashes).zipWithIndex.map { case ((a, b), i) =>
      min((x * a + b) % P).as(s"h$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Per-ROW MinHash signature over each doc's shingle array —
    * (doc_id, gs, h0..h{n-1}) with no explode and no aggregation.
    *
    * Batch-REJECTED (DESIGN.md, measured 2.5× slower than the
    * aggregate form: 128 interpreted CodegenFallback transforms per
    * row cost more than the shuffle they save) — but exactly right for
    * STREAMING, where docs arrive row-at-a-time and an aggregation
    * would force update-mode state: here the signature is a pure
    * projection any append-mode stream can run. Produces bit-identical
    * signatures to [[minhashSignature]] (min over the same shingle
    * set under the same hash family).
    */
  def minhashSignatureRow(docs: DataFrame, nHashes: Int, n: Int): DataFrame = {
    val based = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), array_distinct(expr(gramArrayExpr(n))).as("gs"))
      .filter(size(col("gs")) > 0)
      .withColumn("xs",
        expr(s"transform(gs, g -> (CAST(hash(g) AS BIGINT) & 4294967295) % $P)"))
    val sigs = coefficients(nHashes).zipWithIndex.map { case ((a, b), i) =>
      expr(s"array_min(transform(xs, x -> (x * ${a}L + ${b}L) % $P))").as(s"h$i")
    }
    based.select(col("doc_id") +: col("gs") +: sigs: _*)
  }

  /** MinHash signature via the native codegen kernel
    * ([[MinHashWords]]): one generated loop per doc over the token
    * array — no gram materialization, no explode, no aggregation, no
    * doc-keyed shuffle. Bit-identical output to [[minhashSignature]]
    * over the same docs (asserted in TextKernelsSpec); docs shorter
    * than the shingle width drop out of both. This is the production
    * signature stage; the aggregate form remains the
    * independently-derived twin the equality spec checks against.
    */
  def minhashSignatureNative(docs: DataFrame, nHashes: Int, n: Int): DataFrame = {
    TextKernels.ensureRegistered(docs.sparkSession)
    val sig = docs
      .select(col("doc_id"),
        expr(s"graft_minhash(split(text, ' '), $n, $nHashes)").as("mh"))
      .filter(col("mh").isNotNull)
    val hs = (0 until nHashes).map(i => col("mh").getItem(i).as(s"h$i"))
    sig.select(col("doc_id") +: hs: _*)
  }

  /** LSH banding: (doc_id, band, band_hash), one row per band.
    * Docs agreeing on any band become candidate pairs via an equi-join
    * on (band, band_hash) — the shuffle key that replaces the cross
    * join. bands*rowsPerBand must equal the signature width.
    */
  def lshBands(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { j =>
      val rowCols = (j * rowsPerBand until (j + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(j).as("band"), hash(rowCols: _*).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** Candidate pairs from any banding table keyed (doc_id, band, bh). */
  def bandCandidates(bandsDf: DataFrame): DataFrame =
    bandsDf.as("l")
      .join(bandsDf.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"))
      .distinct()

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over a (doc_id, g) feature relation — callers pass
    * the n-gram shingles, NOT raw tokens. Feature choice is what makes
    * simhash discriminate: over raw unigrams of a small shared
    * vocabulary, every doc pair has correlated signatures (measured:
    * candidate hamming centered ~15 on this corpus, drowning true dups);
    * over 3-gram shingles the feature space is |vocab|³-sized, so
    * random pairs sit at hamming ~32 and true near-dups at ≤~6 —
    * a clean margin. One aggregation pass: 64 signed bit-sums then bit
    * assembly; partial aggregation runs before the doc-keyed shuffle.
    */
  def simhash(sh: DataFrame): DataFrame = {
    val f = sh.withColumn("th", xxhash64(col("g")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("th"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$i")
    }
    val sig = f.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val assembled = (0 until 64)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)): Column)
      .reduce(_ + _)
    sig.select(col("doc_id"), assembled.as("simhash"))
  }

  /** SimHash via the native codegen kernel ([[SimHashWords]]): one
    * generated loop per doc — gram bytes, xxhash64, dedup by sorted
    * hash, 64 bit-sums — replacing the explode + 64-sum aggregate +
    * doc-keyed shuffle. Matters doubly for q63, whose candidate
    * self-join executes the signature subtree twice (no exchange
    * reuse — DESIGN.md). Signature equality vs [[simhash]] asserted in
    * TextKernelsSpec; the one documented divergence is within-doc
    * xxhash64 collisions (~m²/2^65, recall-only).
    */
  def simhashNative(docs: DataFrame, n: Int): DataFrame = {
    TextKernels.ensureRegistered(docs.sparkSession)
    docs
      .select(col("doc_id"),
        expr(s"graft_simhash(split(text, ' '), $n)").as("simhash"))
      .filter(col("simhash").isNotNull)
  }

  /** Disjoint banding of a 64-bit simhash into `bands` equal bit
    * slices. Pigeonhole guarantee: a pair within hamming distance
    * (bands - 1) flips at most (bands - 1) bands, so at least one band
    * is untouched and the pair IS a candidate — recall is deterministic
    * up to that distance, not probabilistic.
    *
    * Scale warning (round-1 verdict): the guarantee radius and the
    * bucket count fight each other. 16 bands of 4 bits guarantee
    * hamming ≤ 15 but give only 16 buckets per band, so bucket size is
    * n/16 and in-bucket pairing is O(n²/16) — quadratic in corpus size.
    * This form is kept as the textbook building block; the production
    * path is [[simhashComboBands]], which recovers a wide key without
    * giving up the recall radius.
    */
  def simhashBands(sig: DataFrame, bands: Int = 16): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("simhash"), width * j).bitwiseAND(lit(mask)).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** Combination banding: split the 64-bit simhash into `blocks` equal
    * slices and emit one band per r-combination of blocks, keyed by the
    * concatenation of the selected blocks' bits (a (64/blocks)·r-bit
    * key). Pigeonhole guarantee: a pair at hamming ≤ (blocks - r) dirties
    * at most (blocks - r) blocks, leaving ≥ r clean blocks — so at least
    * one specific r-combination is clean on both docs and the pair
    * collides in that band. Deterministic recall radius = blocks - r.
    *
    * Why this beats single-block bands at scale: with blocks=16, r=3 the
    * key is 12 bits (4096 buckets/band vs 16), so expected bucket size is
    * n/4096 and total candidate work is C(16,3)·n²/2·4096 ≈ 0.068·n² —
    * ~7× less pairing work than 16×4-bit bands (n²/2) at the same
    * corpus, spread over 560×4096 ≈ 2.3M shuffle keys instead of 256
    * (no giant per-bucket arrays, no skewed reducers). The recall radius
    * narrows 15 → 13, still above the corpus's measured near-dup
    * hamming (≤ 9). At larger n, raise r (r=4 → 16-bit keys, radius 12,
    * 36× less pairing work) — the radius/cost dial is explicit.
    *
    * The combination table is a tiny dimension (C(blocks,r) rows)
    * broadcast against the signature relation — the row expansion is
    * C(blocks,r) per doc, the only per-doc cost.
    */
  def simhashComboBands(sig: DataFrame, blocks: Int = 16, r: Int = 3): DataFrame = {
    require(64 % blocks == 0, "blocks must divide 64")
    require(r >= 1 && r < blocks, "need 1 <= r < blocks")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val spark = sig.sparkSession
    import spark.implicits._
    val combos = (0 until blocks).combinations(r).zipWithIndex
      .map { case (sel, cid) => (cid, sel.toArray) }
      .toSeq.toDF("band", "sel")
    sig.join(broadcast(combos))
      .select(col("doc_id"), col("simhash"), col("band"),
        expr(s"aggregate(sel, 0L, (acc, i) -> acc * ${mask + 1L}L" +
          s" + (shiftright(simhash, i * $width) & ${mask}L))").as("bh"))
  }

  /** Candidate pairs from combo-banded simhash signatures, prefiltered
    * to the banding's own guaranteed radius (hamming ≤ blocks - r) —
    * the prefilter and the pigeonhole guarantee agree by construction,
    * so no band-guaranteed pair is ever dropped.
    *
    * Shape note (measured, sf0.1): with 12-bit combo keys the expected
    * bucket size is n/4096 ≈ 1, so this is a self-equi-join on
    * (band, bh) with the bit_count cut inline in the join condition —
    * the pairing runs inside codegen and the exchange feeding both
    * sides is reused. The round-1 group-then-pair form (collect_list +
    * array lambdas) was right for 16 giant buckets but is wrong here:
    * higher-order functions are CodegenFallback, and ~780k surviving
    * tiny groups paid ~25 µs of interpreted lambda each (20 s at
    * sf0.1 vs ~3 s for this join). Only within-radius pairs survive
    * the condition: a random 64-bit pair passes hamming ≤ 13 with
    * P ≈ 3e-6, so candidate volume scales with the corpus's real
    * near-dup count, not n² (asserted in TextSimSpec).
    */
  def simhashCandidates(sig: DataFrame, blocks: Int = 16, r: Int = 3): DataFrame = {
    val radius = blocks - r
    // No static SHUFFLE_HASH hint here. Hash does beat sort-merge on
    // this join (equal sides, tiny per-key groups — skips two 2.8M-row
    // sorts, measured ~2 s off at sf0.1), but a FORCED hash build is a
    // scale bug: at 100× sf0.1 the fixed-partition-count build side
    // put ~9M rows under one in-memory hash map and died with
    // cannotAcquireMemoryToBuildUnsafeHashedRelation. The session
    // posture (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold)
    // re-takes the hash plan from REAL map-output sizes — AQE converts
    // the sort-merge to a hash build only when every partition fits,
    // and keeps the spillable sort above it (pinned in PlanAuditSpec).
    val bands = simhashComboBands(sig, blocks, r)
    bands.as("l").join(bands.as("r"),
      col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.doc_id") < col("r.doc_id") &&
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))) <= radius)
      .select(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"))
      .distinct()
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
