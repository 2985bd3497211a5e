package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter build/probe surfaced as SQL functions — the engine's
  * wrapper over Spark's own runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the expressions
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects), exposed
  * so a PIPELINE can use the same trick explicitly: sketch a large
  * build side once, broadcast ~bits instead of a hash relation, and
  * prefilter the 100 TB probe side before any shuffle happens
  * (q142's decontamination tier is the catalog application).
  *
  * Both sides wrap the value in `XxHash64` exactly as Spark's
  * `InjectRuntimeFilter` does, so build and probe agree for every input
  * type and the probe stays inside whole-stage codegen
  * (`BloomFilterMightContain.doGenCode`) — no UDF, no codegen fence on
  * the corpus-side scan.
  *
  * Guarantee inherited from the sketch: NO false negatives (a bit-OR
  * merge is order-independent, so the serialized filter is also
  * bit-identical across partition counts — asserted in
  * ExtensionsSpec). Callers treat a positive as a CANDIDATE and
  * exact-verify downstream; q142 shows the shape.
  */
object BloomKit {

  /** `graft_bloom_agg(x[, expectedItems])` — aggregate a column into a
    * serialized Bloom filter (binary). `expectedItems` (foldable int)
    * sizes the filter; default is Spark's runtime-filter default
    * (1M items, ~1 MB).
    */
  def bloomAggBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(v) => new BloomFilterAggregate(new XxHash64(Seq(v)))
    case Seq(v, nE) if nE.foldable =>
      new BloomFilterAggregate(new XxHash64(Seq(v)),
        nE.eval().asInstanceOf[Number].longValue())
    case _ =>
      throw new IllegalArgumentException(
        s"graft_bloom_agg(value[, expectedItems]) takes 1 or 2 arguments (literal int), got ${exprs.length}")
  }

  /** `graft_might_contain(bloom, x)` — probe a serialized filter; the
    * bloom side must be foldable (a literal from a collected build) or
    * a scalar subquery, mirroring the upstream expression's contract.
    */
  def mightContainBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(b, v) => BloomFilterMightContain(b, new XxHash64(Seq(v)))
    case _ =>
      throw new IllegalArgumentException(
        s"graft_might_contain(bloom, value) takes 2 arguments, got ${exprs.length}")
  }

  /** Idempotently register both functions on a session (the
    * per-session path; GraftExtensions injects the same builders
    * catalog-wide). */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", bloomAggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", mightContainBuilder, "built-in")
  }
}
