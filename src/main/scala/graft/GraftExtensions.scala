package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomKit, DotProduct, HadamardRotate, MatVec, VecSub, VectorKernels}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session-extension entry point (SURVEY.md §7.4's extension ladder):
  * lets any session pick up the engine's native functions at build
  * time —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)` —
  * instead of calling VectorKernels.ensureRegistered per session. The
  * catalog-level injection makes `graft_dot` visible to plain SQL,
  * views, and thrift clients, not just code paths that remembered to
  * register it. No custom planner rules or strategies are injected:
  * nothing in the operator inventory needs semantics Catalyst can't
  * already express (DESIGN.md "what we deliberately did NOT build").
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      // Arity-checked builder (shared with the per-session registration
      // path) so SQL like graft_dot(v) fails analysis with the expected
      // signature, not an IndexOutOfBoundsException.
      (exprs: Seq[Expression]) => VectorKernels.dotBuilder(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_sub"),
      new ExpressionInfo(classOf[VecSub].getName, "graft_sub"),
      (exprs: Seq[Expression]) => VectorKernels.subBuilder(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hdrot"),
      new ExpressionInfo(classOf[HadamardRotate].getName, "graft_hdrot"),
      (exprs: Seq[Expression]) => VectorKernels.hdrotBuilder(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_matvec"),
      new ExpressionInfo(classOf[MatVec].getName, "graft_matvec"),
      (exprs: Seq[Expression]) => VectorKernels.matvecBuilder(exprs)))
    // Bloom build/probe (the runtime-filter machinery as a user
    // surface — BloomKit's scaladoc has the scale argument; q142 the
    // catalog application).
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) => BloomKit.bloomAggBuilder(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (exprs: Seq[Expression]) => BloomKit.mightContainBuilder(exprs)))
    // Text sketch kernels (same builders as the per-session
    // TextKernels.ensureRegistered path) — a cluster configuring
    // spark.sql.extensions gets the whole graft_ function surface.
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[graft.functions.MinHashWords].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => graft.functions.TextKernels.minhashBuilder(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.functions.SimHashWords].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => graft.functions.TextKernels.simhashBuilder(exprs)))
  }
}
