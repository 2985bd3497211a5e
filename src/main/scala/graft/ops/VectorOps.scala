package graft.ops

import graft.T
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity operators over the embeddings table — north-star
  * extensions (SURVEY.md §2.2 "top-k vector similarity"). No analog in
  * the reference.
  *
  * Cosine is computed by the native codegen'd DotProduct expression
  * (graft.functions.VectorKernels) entirely in double precision — the
  * custom-Expression tier of SURVEY.md §7.4, chosen because the
  * higher-order aggregate(zip_with(...)) form interprets its lambda and
  * allocates per pair. Norms are computed once per vector *before* any
  * join so the O(pairs) stage only multiplies and sums.
  *
  * Scale tiers:
  *  - q64 blocks the pair space by an existing coarse key (label) — the
  *    IVF idea with a given quantizer; pairs never cross blocks.
  *  - q65 is brute-force top-k for a bounded query set: the query side
  *    is broadcast, the corpus side streams, so cost is |Q|·n with no
  *    shuffle of the corpus.
  *  - q66 is IVF with *learned* centroids (per-label means) and
  *    nprobe=4 — the approximate path whose recall is asserted against
  *    q65 in ScalaTest (no SQL oracle: result depends on probe choice).
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame

  /** embeddings with the raw float vector and a precomputed norm. The
    * dot-product kernel is the codegen'd DotProduct expression
    * (graft.functions.VectorKernels) — no per-pair array allocation, no
    * interpreted lambda; arithmetic is identical to the higher-order
    * form (double widening, left-to-right accumulation) so oracle
    * results are unchanged.
    */
  private def emb(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorKernels.ensureRegistered(s)
    T.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  val queries: Map[String, Q] = Map(
    // Label-blocked near-duplicate pairs by cosine ≥ 0.35.
    "q64_embedding_neardup" -> ((s, d) => {
      val e = emb(s, d)
      val a = e.select(col("vec_id").as("id1"), col("label"), col("v").as("v1"), col("nrm").as("n1"))
      val b = e.select(col("vec_id").as("id2"), col("label").as("label2"), col("v").as("v2"), col("nrm").as("n2"))
      a.join(b, col("label") === col("label2") && col("id1") < col("id2"))
        .withColumn("cos", dot("v1", "v2") / (col("n1") * col("n2")))
        .filter(col("cos") >= 0.35)
        .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos_sim"))
        .orderBy(col("id1"), col("id2"))
    }),

    // Brute-force cosine top-k (k=5) for queries vec_id < 5, self
    // excluded. Query side broadcast; row_number prunes per query.
    "q65_ann_topk_bruteforce" -> ((s, d) => {
      val e = emb(s, d)
      val q = broadcast(e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")))
      val c = e.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("id2"))
      q.join(c, col("q_id") =!= col("id2"))
        .withColumn("cos", dot("qv", "v2") / (col("qn") * col("n2")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn"), col("id2").as("neighbor_id"),
                round(col("cos"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rn"))
    }),

    // IVF-style approximate top-k: centroids = per-label mean vectors,
    // probe the nprobe=4 closest centroids per query, exact search
    // within probed cells only. At 100 TB the corpus is partitioned by
    // cell, so a query touches nprobe partitions instead of all data.
    "q66_ann_topk_ivf" -> ((s, d) => {
      val e = emb(s, d)
      // centroids: elementwise mean per label, reassembled in position order
      val cent = e.select(col("label"), posexplode(col("v")))
        .groupBy(col("label"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("label").as("c_label"),
                expr("transform(pm, x -> x.m)").as("cv"))
        .withColumn("cn", sqrt(expr("graft_dot(cv, cv)")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      // nprobe=4 nearest centroids per query
      val wProbe = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("c_label"))
      val probes = broadcast(q.crossJoin(broadcast(cent))
        .withColumn("ccos", dot("qv", "cv") / (col("qn") * col("cn")))
        .withColumn("pr", row_number().over(wProbe))
        .filter(col("pr") <= 4)
        .select(col("q_id"), col("qv"), col("qn"), col("c_label")))
      val c = e.select(col("vec_id").as("id2"), col("label"), col("v").as("v2"), col("nrm").as("n2"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("id2"))
      probes.join(c, col("c_label") === col("label") && col("q_id") =!= col("id2"))
        .withColumn("cos", dot("qv", "v2") / (col("qn") * col("n2")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn"), col("id2").as("neighbor_id"),
                round(col("cos"), 4).as("cos_sim"))
        .orderBy(col("q_id"), col("rn"))
    })
  )

  private val embCte =
    """WITH e AS (SELECT vec_id, label, unnest(embedding) AS v,
      |                  generate_subscripts(embedding,1) AS i FROM embeddings),
      |n AS (SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE)*CAST(v AS DOUBLE))) AS nrm
      |      FROM e GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q64_embedding_neardup" ->
      s"""$embCte,
         |d AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |             sum(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE)) AS dot
         |      FROM e a JOIN e b ON a.i = b.i AND a.label = b.label
         |                        AND a.vec_id < b.vec_id
         |      GROUP BY 1, 2)
         |SELECT id1, id2, round(dot/(n1.nrm*n2.nrm), 4) AS cos_sim
         |FROM d JOIN n n1 ON id1 = n1.vec_id JOIN n n2 ON id2 = n2.vec_id
         |WHERE dot/(n1.nrm*n2.nrm) >= 0.35
         |ORDER BY id1, id2""".stripMargin,

    "q65_ann_topk_bruteforce" ->
      s"""$embCte,
         |d AS (SELECT a.vec_id AS q_id, b.vec_id AS id2,
         |             sum(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE)) AS dot
         |      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 5
         |                        AND b.vec_id <> a.vec_id
         |      GROUP BY 1, 2),
         |c AS (SELECT q_id, id2, dot/(n1.nrm*n2.nrm) AS cos
         |      FROM d JOIN n n1 ON q_id = n1.vec_id JOIN n n2 ON id2 = n2.vec_id),
         |r AS (SELECT q_id, id2, cos,
         |             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, id2) AS rn
         |      FROM c)
         |SELECT q_id, rn, id2 AS neighbor_id, round(cos, 4) AS cos_sim
         |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin
    // q66_ann_topk_ivf: no SQL oracle (probe-dependent approximate
    // result); recall vs q65 asserted in VectorOpsSpec.
  )
}
