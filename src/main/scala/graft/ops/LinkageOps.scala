package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the "same real-world entity,
  * different strings" matching step every CRM/master-data pipeline runs
  * before analytics (and every training-data pipeline runs when merging
  * crawls with metadata feeds). The reference reaches this surface only
  * through `--query` passthrough (/root/reference/main.go:106); here it
  * is a first-class distributed operator.
  *
  * The scale algorithm is FastSS-style deletion-neighborhood blocking
  * (Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007):
  * ED(s,t) <= 1  ⟺  Del≤1(s) ∩ Del≤1(t) ≠ ∅, where Del≤1(x) is x plus
  * every single-character deletion of x. Proof sketch: equality shares x
  * itself; a substitution at i shares the delete-at-i variant; an
  * insert/delete shares the shorter string. Conversely any shared
  * variant bounds ED by 2 deletions ⇒ candidates are a superset, and an
  * exact `levenshtein <= 1` verify on candidates only makes the result
  * exact. This turns a fuzzy join into a (L+1)-fan-out projection plus
  * ONE equi-shuffle on an 8-byte variant hash — no all-pairs subtree,
  * no data-dependent block sizes (contrast sorted-neighborhood or
  * soundex blocking, where one hot block goes quadratic at 100 TB).
  * Hash collisions only ever ADD candidates; the verify prunes them, so
  * joining on xxhash64(variant) instead of the variant string is safe
  * and keeps the shuffle rows narrow.
  */
object LinkageOps {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic "dirty CRM feed" derived from the master: one ED<=1
    * corruption per row, class-cycled by key so all four edit kinds
    * (none / delete / substitute / insert) appear. Positions 10..18 hit
    * the digit region of `Customer#%09d`, which is where real-world
    * typos create AMBIGUOUS matches (deleting a digit from a zero-run
    * is ED 1 from many masters) — the operator must surface that, not
    * pick silently.
    */
  private val dirtySql =
    """CASE CAST(c_custkey % 4 AS INT)
      |  WHEN 1 THEN concat(substring(c_name, 1, CAST(c_custkey % 9 AS INT) + 9),
      |                     substring(c_name, CAST(c_custkey % 9 AS INT) + 11, 100))
      |  WHEN 2 THEN concat(substring(c_name, 1, CAST(c_custkey % 9 AS INT) + 9), 'X',
      |                     substring(c_name, CAST(c_custkey % 9 AS INT) + 11, 100))
      |  WHEN 3 THEN concat(substring(c_name, 1, CAST(c_custkey % 9 AS INT) + 10), 'Z',
      |                     substring(c_name, CAST(c_custkey % 9 AS INT) + 11, 100))
      |  ELSE c_name
      |END""".stripMargin

  /** Del≤1 neighborhood of column `nm`: p = 0 keeps the string, p >= 1
    * deletes character p. Pure codegen (sequence + explode + substring),
    * no HOF lambdas. Duplicate variants (deleting any char of a same-char
    * run yields one string) are collapsed BEFORE the join: generation is
    * partition-local, so the distinct's partial aggregate removes them
    * map-side and the variant-hash shuffle carries unique (id, variant)
    * rows only — without this, a zero-run join fans out quadratically in
    * run length.
    */
  def delNeighborhood(r: DataFrame, idCol: String): DataFrame =
    r.withColumn("p", explode(expr("sequence(0, length(nm))")))
      .withColumn("v",
        expr("CASE WHEN p = 0 THEN nm ELSE concat(substring(nm, 1, p - 1), substring(nm, p + 1, 100)) END"))
      .select(col(idCol), col("nm"), xxhash64(col("v")).as("vh"))
      .distinct()

  /** Exact fuzzy linkage at edit distance <= 1: dirty feed -> candidate
    * pairs via shared deletion variants -> levenshtein verify -> per
    * record match report (unique / ambiguous / none, min matched key).
    */
  def fuzzyLink(master: DataFrame, dirtyFeed: DataFrame): DataFrame = {
    val dv = delNeighborhood(dirtyFeed.select(col("link_id"), col("nm")), "link_id")
    val mv = delNeighborhood(
      master.select(col("c_custkey"), col("c_name").as("nm")), "c_custkey")
      .withColumnRenamed("nm", "mnm")
    val verified = dv.join(mv, Seq("vh"))
      .select(col("link_id"), col("nm"), col("c_custkey"), col("mnm"))
      .distinct()
      .filter(levenshtein(col("nm"), col("mnm")) <= 1)
    val agg = verified.groupBy(col("link_id"))
      .agg(count(lit(1)).as("n_match"), min(col("c_custkey")).as("matched_key"))
    dirtyFeed.join(agg, Seq("link_id"), "left")
      .select(col("link_id"), col("nm").as("dirty_name"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        coalesce(col("matched_key"), lit(-1L)).as("matched_key"),
        expr("CASE WHEN n_match IS NULL THEN 'none' WHEN n_match = 1 THEN 'unique' ELSE 'ambiguous' END")
          .as("status"))
  }

  val queries: Map[String, Q] = Map(
    // The DuckDB oracle is the NAIVE all-pairs levenshtein join, so the
    // gate proves candidate generation is COMPLETE (finds every ED<=1
    // pair), not merely that verify is sound.
    "q159_fuzzy_linkage" -> ((s, d) => {
      val master = T.customer(s, d).select(col("c_custkey"), col("c_name"))
      val dirtyFeed = master.select(col("c_custkey").as("link_id"), expr(dirtySql).as("nm"))
      fuzzyLink(master, dirtyFeed).orderBy(col("link_id"))
    }),

    // Sorted-neighborhood blocking (Hernández/Stolfo) — the OTHER
    // classic linkage blocking family next to q159's deletion-
    // neighborhood: sort all records by the blocking key, compare only
    // records within a fixed rank window (w = 3), verify with exact
    // Levenshtein ≤ 4. Candidate volume is EXACTLY (w−1)·n regardless
    // of key skew — the property that makes the method a standard
    // dial when hash blocks explode. The global sort is the
    // constant-key ScalableRank regime (never one task); window
    // pairing is a bounded explode of rank+1..rank+w−1 probe keys →
    // one rank-keyed equi-join (no banded inequality join, no BNL).
    "q211_sorted_neighborhood" -> ((s, d) =>
      sortedNeighborhood(
        T.part(s, d).select(col("p_partkey").as("key"), col("p_name").as("nm")),
        w = 3, maxDist = 4))
  )

  /** Sorted-neighborhood candidate generation + Levenshtein verify over
    * a (key, nm) relation — see the q211 entry for rationale. `w` is
    * the number of FOLLOWING ranks each record is compared against.
    */
  def sortedNeighborhood(records: DataFrame, w: Int, maxDist: Int): DataFrame = {
    val ranked = graft.functions.ScalableRank
      .withRanks(records.withColumn("g", lit(1)), Seq("g"),
        Seq(col("nm"), col("key")), Seq(col("nm"), col("key")), 32)
      .select(col("key"), col("nm"), col("rn"))
    val probes = ranked
      .withColumn("rn2", explode(expr(s"sequence(rn + 1, rn + $w)")))
      .select(col("key").as("a_key"), col("nm").as("a_nm"), col("rn2"))
    probes.join(ranked
        .select(col("key").as("b_key"), col("nm").as("b_nm"),
                col("rn").as("rn2")), "rn2")
      .withColumn("dist", levenshtein(col("a_nm"), col("b_nm")))
      .filter(col("dist") <= maxDist)
      .select(col("a_key"), col("b_key"), col("a_nm"), col("b_nm"),
              col("dist").cast("long").as("dist"))
      .orderBy(col("a_key"), col("b_key"), col("a_nm"), col("b_nm"), col("dist"))
  }

  val oracle: Map[String, String] = Map(
    "q159_fuzzy_linkage" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS link_id,
        |    CASE CAST(c_custkey % 4 AS INT)
        |      WHEN 1 THEN substr(c_name, 1, CAST(c_custkey % 9 AS INT) + 9)
        |                  || substr(c_name, CAST(c_custkey % 9 AS INT) + 11, 100)
        |      WHEN 2 THEN substr(c_name, 1, CAST(c_custkey % 9 AS INT) + 9) || 'X'
        |                  || substr(c_name, CAST(c_custkey % 9 AS INT) + 11, 100)
        |      WHEN 3 THEN substr(c_name, 1, CAST(c_custkey % 9 AS INT) + 10) || 'Z'
        |                  || substr(c_name, CAST(c_custkey % 9 AS INT) + 11, 100)
        |      ELSE c_name
        |    END AS nm
        |  FROM customer),
        |pairs AS (
        |  SELECT DISTINCT d.link_id, d.nm, m.c_custkey
        |  FROM dirty d JOIN customer m ON levenshtein(d.nm, m.c_name) <= 1),
        |agg AS (
        |  SELECT link_id, count(*) AS n_match, min(c_custkey) AS matched_key
        |  FROM pairs GROUP BY 1)
        |SELECT d.link_id, d.nm AS dirty_name,
        |       COALESCE(a.n_match, 0) AS n_match,
        |       COALESCE(a.matched_key, -1) AS matched_key,
        |       CASE WHEN a.n_match IS NULL THEN 'none'
        |            WHEN a.n_match = 1 THEN 'unique'
        |            ELSE 'ambiguous' END AS status
        |FROM dirty d LEFT JOIN agg a USING (link_id)
        |ORDER BY link_id""".stripMargin,

    "q211_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT p_partkey, p_name,
        |         CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rn
        |  FROM part
        |), pr AS (
        |  SELECT a.p_partkey AS a_key, a.p_name AS a_nm,
        |         b.p_partkey AS b_key, b.p_name AS b_nm
        |  FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
        |)
        |SELECT a_key, b_key, a_nm, b_nm,
        |       CAST(levenshtein(a_nm, b_nm) AS BIGINT) AS dist
        |FROM pr WHERE levenshtein(a_nm, b_nm) <= 4
        |ORDER BY a_key, b_key, a_nm, b_nm, dist""".stripMargin
  )
}
