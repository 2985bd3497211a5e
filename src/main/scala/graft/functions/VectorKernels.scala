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

/** Fixed structured rotation for the RR-PQ tier (q265/q266): computes
  * H·(signs ⊙ v)/√n where H is the n×n Walsh-Hadamard matrix — a signed
  * permutation of ±1 columns, so R = H·diag(signs)/√n is exactly
  * orthonormal. This is the "random rotation" baseline of the OPQ paper
  * (Ge et al., CVPR 2013, §5's RR-PQ) and the structured pre-transform
  * FAISS ships (ITQ/OPQ-style VectorTransform): it balances variance
  * across PQ subspaces at O(n log n) per vector via the in-place
  * butterfly below, with no trained state — the signs are a fixed
  * deterministic draw, which is what keeps the whole tier
  * oracle-replayable (DuckDB recomputes the same rotation from the
  * closed form H[j][i] = (−1)^popcount(j AND i)).
  *
  * The butterfly's additions associate differently than the oracle's
  * per-output-dim sums, so rotated values agree only to O(ulp) across
  * engines — absorbed by the same argmin-margin bound every vector
  * oracle rests on (asserted for the rotated chains in VectorOpsSpec).
  * The final 1/√n scaling is exact when n is a power of two (it always
  * is here — enforced), so it adds no rounding of its own.
  *
  * Same strict input domain as the other kernels: equal lengths, no
  * null elements, and additionally a power-of-two length.
  */
case class HadamardRotate(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hdrot expects array<float|double> inputs (vector, signs), got ${left.dataType} and ${right.dataType}")

  @transient private lazy val leftFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = VectorKernels.checkedPow2("graft_hdrot", VectorKernels.checkedLength("graft_hdrot", a, b))
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) VectorKernels.nullElement("graft_hdrot", i)
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val s = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      buf(i) = x * s
      i += 1
    }
    var len = 1
    while (len < n) {
      var base = 0
      while (base < n) {
        var j = base
        while (j < base + len) {
          val x = buf(j); val y = buf(j + len)
          buf(j) = x + y; buf(j + len) = x - y
          j += 1
        }
        base += len << 1
      }
      len <<= 1
    }
    val sc = 1.0 / math.sqrt(n.toDouble)
    i = 0
    while (i < n) { buf(i) *= sc; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val len = ctx.freshName("len")
      val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sc = ctx.freshName("sc")
      val getA = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = graft.functions.VectorKernels.checkedPow2("graft_hdrot",
         |  graft.functions.VectorKernels.checkedLength("graft_hdrot", $a, $b));
         |double[] $buf = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) graft.functions.VectorKernels.nullElement("graft_hdrot", $i);
         |  $buf[$i] = $getA * $getB;
         |}
         |for (int $len = 1; $len < $n; $len <<= 1) {
         |  for (int $base = 0; $base < $n; $base += $len << 1) {
         |    for (int $j = $base; $j < $base + $len; $j++) {
         |      double $x = $buf[$j]; double $y = $buf[$j + $len];
         |      $buf[$j] = $x + $y; $buf[$j + $len] = $x - $y;
         |    }
         |  }
         |}
         |double $sc = 1.0 / java.lang.Math.sqrt((double) $n);
         |for (int $i = 0; $i < $n; $i++) { $buf[$i] *= $sc; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buf);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HadamardRotate =
    copy(left = newLeft, right = newRight)
}

/** Dense mat-vec for LEARNED rotations (round-12, the OPQ tier q288):
  * y = M·x with M a flat ROW-MAJOR n×n matrix (array<double|float>,
  * length n²) and x a length-n vector. The structured [[HadamardRotate]]
  * butterfly only covers the FIXED ±1-diagonal rotation; a trained OPQ
  * rotation is an arbitrary orthogonal matrix, and the higher-order
  * `transform(sequence(...), i -> aggregate(...))` form would interpret
  * its lambdas per corpus row (the measured CLAUDE.md HOF trap). Each
  * output dim accumulates products left-to-right over j — exactly the
  * per-output-dim sum the DuckDB oracle replays (engines differ only by
  * the usual O(ulp) sum-order drift the argmin-margin bound absorbs).
  * Same strict input domain as the other kernels, plus the length
  * contract |M| = |x|².
  */
case class MatVec(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_matvec expects array<float|double> inputs (flat row-major matrix, vector), got ${left.dataType} and ${right.dataType}")

  @transient private lazy val leftFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val m = l.asInstanceOf[ArrayData]
    val x = r.asInstanceOf[ArrayData]
    val n = VectorKernels.checkedSquare("graft_matvec", m, x)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      var j = 0
      while (j < n) {
        val k = i * n + j
        if (m.isNullAt(k) || x.isNullAt(j)) VectorKernels.nullElement("graft_matvec", k)
        val a = if (leftFloat) m.getFloat(k).toDouble else m.getDouble(k)
        val b = if (rightFloat) x.getFloat(j).toDouble else x.getDouble(j)
        s += a * b
        j += 1
      }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, x) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val getM = if (leftFloat) s"(double) $m.getFloat($k)" else s"$m.getDouble($k)"
      val getX = if (rightFloat) s"(double) $x.getFloat($j)" else s"$x.getDouble($j)"
      s"""
         |int $n = graft.functions.VectorKernels.checkedSquare("graft_matvec", $m, $x);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    int $k = $i * $n + $j;
         |    if ($m.isNullAt($k) || $x.isNullAt($j)) graft.functions.VectorKernels.nullElement("graft_matvec", $k);
         |    $acc += $getM * $getX;
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MatVec =
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

  /** The Walsh-Hadamard butterfly is only defined for power-of-two
    * lengths (H_n exists for n = 2^k).
    */
  def checkedPow2(fn: String, n: Int): Int = {
    if (n <= 0 || (n & (n - 1)) != 0) throw new IllegalArgumentException(
      s"$fn: length $n is not a power of two; the Walsh-Hadamard rotation requires n = 2^k")
    n
  }

  /** The mat-vec length contract: |M| must be exactly |x|². */
  def checkedSquare(fn: String, m: ArrayData, x: ArrayData): Int = {
    val n = x.numElements()
    val mn = m.numElements()
    if (mn != n.toLong * n) throw new IllegalArgumentException(
      s"$fn: flat matrix has $mn elements, expected ${n.toLong * n} (= |vector|² for a length-$n vector)")
    n
  }

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

  def hdrotBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_hdrot(array<float>, array<double>) takes exactly 2 arguments (vector, signs), got ${exprs.length}")
    HadamardRotate(exprs(0), exprs(1))
  }

  def matvecBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_matvec(array<double>, array<float>) takes exactly 2 arguments (flat row-major matrix, vector), got ${exprs.length}")
    MatVec(exprs(0), exprs(1))
  }

  /** Idempotently register the SQL-facing kernel names on a session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sub", subBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hdrot", hdrotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_matvec", matvecBuilder, "built-in")
  }
}
