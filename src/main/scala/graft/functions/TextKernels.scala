package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernel for the MinHash signature hot loop — the
  * second application of SURVEY §7.4's "custom codegen Expression only
  * if bench demands" clause (the first is [[DotProduct]]).
  *
  * The aggregate form ([[TextSim.minhashSignature]]) pays, per doc:
  * an interpreted higher-order `transform` to build the gram array
  * (HOFs are CodegenFallback), an `array_distinct`, an explode to one
  * row per gram, 128 partial min-aggregates, and a doc-keyed shuffle of
  * 128 longs. The per-row HOF form was measured 2.5× WORSE (DESIGN.md:
  * 128 interpreted lambdas per row). This expression is the form both
  * were approximating: ONE generated loop over the token array that
  * builds each n-gram's bytes, hashes them, and folds all `nHashes`
  * mins — no gram array, no explode, no aggregation, no shuffle; the
  * signature stage becomes scan → project.
  *
  * Bit-compatibility contract (asserted in TextKernelsSpec): identical
  * output to `minhashSignature(shingles(docs, n), nHashes)` —
  *  - grams are `concat_ws(' ', slice(ws, i+1, n))`, built here with
  *    the same null-skipping `UTF8String.concatWs`;
  *  - the base hash is Spark's `hash(g)` = Murmur3 of the UTF8 bytes,
  *    seed 42, reduced to [0, P) exactly as the aggregate form does
  *    (`(int64 & 0xFFFFFFFF) % P`, P = 2^31 - 1);
  *  - the (a, b) family is [[TextSim.coefficients]] (seed 42);
  *  - min over the gram MULTISET equals min over the distinct set, so
  *    dropping `array_distinct` is exact, not approximate.
  * Docs with fewer than n tokens have an empty gram set and no defined
  * minimum: the aggregate form emits no row, this expression returns
  * NULL (callers filter it — same relation).
  */
case class MinHashWords(child: Expression, n: Int, nHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && nHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, n >= 1, nHashes >= 1), got ${child.dataType}, n=$n, nHashes=$nHashes")
  }

  private val P = 2147483647L // 2^31 - 1; x,a < P keeps x*a+b < 2^62

  @transient private lazy val coefA: Array[Long] =
    TextSim.coefficients(nHashes).map(_._1)
  @transient private lazy val coefB: Array[Long] =
    TextSim.coefficients(nHashes).map(_._2)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val nw = ws.numElements()
    if (nw < n) return null
    val mins = Array.fill(nHashes)(P)
    val gramParts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= nw) {
      var k = 0
      while (k < n) {
        gramParts(k) = if (ws.isNullAt(i + k)) null else ws.getUTF8String(i + k)
        k += 1
      }
      val g = UTF8String.concatWs(space, gramParts: _*)
      val h = Murmur3_x86_32.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42)
      val x = (h.toLong & 0xFFFFFFFFL) % P
      var j = 0
      while (j < nHashes) {
        val v = (x * coefA(j) + coefB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ws => {
      val aRef = ctx.addReferenceObj("minhashA", coefA, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", coefB, "long[]")
      val sRef = ctx.addReferenceObj("minhashSep", space,
        classOf[UTF8String].getName)
      val nw = ctx.freshName("nw")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val g = ctx.freshName("g")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val utf8 = classOf[UTF8String].getName
      val murmur = classOf[Murmur3_x86_32].getName
      val unsafeArr = classOf[UnsafeArrayData].getName
      val parts = (0 until n)
        .map(k => s"$ws.isNullAt($i + $k) ? null : $ws.getUTF8String($i + $k)")
        .mkString(", ")
      s"""
         |int $nw = $ws.numElements();
         |if ($nw < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$nHashes];
         |  java.util.Arrays.fill($mins, ${P}L);
         |  for (int $i = 0; $i + $n <= $nw; $i++) {
         |    $utf8 $g = $utf8.concatWs($sRef, $parts);
         |    long $x = (((long) $murmur.hashUnsafeBytes(
         |        $g.getBaseObject(), $g.getBaseOffset(), $g.numBytes(), 42)) & 4294967295L) % ${P}L;
         |    for (int $j = 0; $j < $nHashes; $j++) {
         |      long $v = ($x * $aRef[$j] + $bRef[$j]) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = $unsafeArr.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashWords =
    copy(child = newChild)
}

object TextKernels {
  /** Arity/literal-checked builder (mirrors [[VectorKernels.dotBuilder]]):
    * `graft_minhash(ws)` defaults to (n=3, nHashes=128);
    * `graft_minhash(ws, n, nHashes)` takes foldable int literals.
    */
  def minhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(ws) => MinHashWords(ws, 3, 128)
    case Seq(ws, nE, kE) if nE.foldable && kE.foldable =>
      MinHashWords(ws,
        nE.eval().asInstanceOf[Number].intValue(),
        kE.eval().asInstanceOf[Number].intValue())
    case _ =>
      throw new IllegalArgumentException(
        s"graft_minhash(array<string>[, n, nHashes]) takes 1 or 3 arguments (literal ints), got ${exprs.length}")
  }

  /** Idempotently register the SQL-facing kernel names on a session. */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashBuilder, "built-in")
}
