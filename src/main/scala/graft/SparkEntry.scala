package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine is a catalog of named DataFrame operators (SURVEY.md §7.1):
  * each entry replicates one operator family from the reference's query
  * surface (delegated to MySQL via /root/reference/main.go:106) or one
  * north-star extension operator, expressed as a declarative Spark plan.
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for the driver's
  * hash-compare correctness gate; ops whose semantics are not
  * SQL-expressible are checked by ScalaTest specs instead and omitted
  * here — since round 8 that is ONLY q255 (DEFLATE output length; the
  * local gate still replays it bit-exact via a CPython-zlib oracle in
  * tools/check.py, measured byte-identical to Deflater(6)) and the
  * streaming surface (spec-by-design): the approximate-ANN tiers
  * (IVF, LSH, PQ, IVFADC) turned out fully replayable in SQL because
  * their coins are md5/fixed-seed, and are oracle-checked like
  * everything else.
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ops.Relational.queries, ops.Relational.oracle),
      (ops.Joins.queries, ops.Joins.oracle),
      (ops.Aggregates.queries, ops.Aggregates.oracle),
      (ops.Windows.queries, ops.Windows.oracle),
      (ops.SortSetOps.queries, ops.SortSetOps.oracle),
      (ops.ScalarFns.queries, ops.ScalarFns.oracle),
      (ops.Dedup.queries, ops.Dedup.oracle),
      (ops.TextOps.queries, ops.TextOps.oracle),
      (ops.CorpusOps.queries, ops.CorpusOps.oracle),
      (ops.VectorOps.queries, ops.VectorOps.oracle),
      (ops.EventOps.queries, ops.EventOps.oracle),
      (ops.LinkageOps.queries, ops.LinkageOps.oracle),
      (ops.PreferenceOps.queries, ops.PreferenceOps.oracle),
      (ops.GraphOps.queries, ops.GraphOps.oracle),
      (multimodal.Multimodal.queries, multimodal.Multimodal.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
