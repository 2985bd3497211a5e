package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst kernel for the vector hot loop — SURVEY.md §7.4's
  * "custom codegen Expression only if bench demands": the higher-order
  * `aggregate(zip_with(...))` form evaluates its lambda interpreted,
  * allocating an intermediate array per row-pair, which is the dominant
  * cost of the O(pairs) similarity stage. This expression generates a
  * tight primitive loop instead (whole-stage codegen'd, zero
  * allocation), with identical arithmetic: elements widened to double,
  * products accumulated left-to-right — so results are bit-identical to
  * the higher-order form and to the DuckDB oracle.
  *
  * Accepts array<float> or array<double> on either side (mixed allowed:
  * float query vectors × double centroids). Defined only on
  * equal-length arrays with non-null elements — mismatched lengths and
  * null slots throw (see [[VectorKernels.checkedLength]]) rather than
  * silently truncating or reading null as 0.0.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> inputs, got ${left.dataType} and ${right.dataType}")

  @transient private lazy val leftFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = VectorKernels.checkedLength("graft_dot", a, b)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) VectorKernels.nullElement("graft_dot", i)
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = graft.functions.VectorKernels.checkedLength("graft_dot", $a, $b);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) graft.functions.VectorKernels.nullElement("graft_dot", $i);
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Element-wise vector subtraction, codegen'd (round-9, for the
  * residual-encoded IVFADC tier q264): the residual r = v − c(v) is
  * computed for EVERY corpus vector, and the higher-order
  * `zip_with(a, b, (x, y) -> x - y)` form interprets its lambda per
  * row (CodegenFallback — the measured CLAUDE.md trap). This generates
  * the primitive loop; elements widen to double exactly like
  * [[DotProduct]], so `graft_dot(graft_sub(a,c), graft_sub(b,c))` is
  * bit-identical to the oracle's `sum((a.v-c.cv)*(b.v-c.cv))` algebra
  * up to the shared argmin-margin argument. Same strict input domain
  * as [[DotProduct]]: equal lengths, no null elements, enforced at
  * runtime — which is what makes the declared containsNull=false
  * output type truthful.
  */
case class VecSub(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sub expects array<float|double> inputs, got ${left.dataType} and ${right.dataType}")

  @transient private lazy val leftFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = VectorKernels.checkedLength("graft_sub", a, b)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) VectorKernels.nullElement("graft_sub", i)
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x - y
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val getA = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = graft.functions.VectorKernels.checkedLength("graft_sub", $a, $b);
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) graft.functions.VectorKernels.nullElement("graft_sub", $i);
         |  $arr[$i] = $getA - $getB;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {
  /** Strict-input guards shared by the interpreted and generated paths
    * (round-9 advisor ask): the kernels' bit-identity claim vs the
    * higher-order `aggregate(zip_with(...))` form only holds on
    * equal-length arrays with no null elements, so mismatched lengths
    * and null elements now FAIL LOUDLY instead of silently truncating
    * to min(length) / reading a null slot as 0.0. Inputs typed
    * containsNull=true (every parquet-read array) stay accepted — the
    * guard is a per-row runtime check, not an analysis-time rejection
    * that would refuse all real tables.
    */
  def checkedLength(fn: String, a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n != m) throw new IllegalArgumentException(
      s"$fn: input arrays differ in length ($n vs $m); the kernel is defined only on equal-length vectors")
    n
  }

  def nullElement(fn: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: null element at index $i; the kernel is defined only on arrays with no null elements " +
        "(use the higher-order zip_with form if null-propagation is wanted)")

  /** Arity-checked builder shared with GraftExtensions: wrong-arity SQL
    * (graft_dot(v), graft_dot()) fails analysis with the expected
    * signature instead of an IndexOutOfBoundsException.
    */
  def dotBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_dot(array<float>, array<float>) takes exactly 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  def subBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_sub(array<float>, array<float>) takes exactly 2 arguments, got ${exprs.length}")
    VecSub(exprs(0), exprs(1))
  }

  /** Idempotently register the SQL-facing kernel names on a session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sub", subBuilder, "built-in")
  }
}
