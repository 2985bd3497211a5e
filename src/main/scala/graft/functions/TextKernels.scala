package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
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

/** Native Catalyst kernel for the 64-bit SimHash signature — same
  * motivation as [[MinHashWords]], sharper payoff: q63's candidate
  * self-join consumes the signature relation on BOTH sides and AQE does
  * not reuse the exchange (DESIGN.md), so the scan→shingle→simhash-agg
  * subtree executes twice per query; this kernel turns that subtree
  * into scan → generated loop.
  *
  * Same gram semantics as [[MinHashWords]] (concat_ws of n tokens,
  * sliding window). The base hash is Spark's `xxhash64(g)` (seed 42),
  * matching [[TextSim.simhash]]'s `th`. One divergence, documented:
  * the aggregate form bit-sums over DISTINCT gram strings; this kernel
  * dedups grams by their sorted xxhash64 values, so two distinct grams
  * in the SAME doc colliding in xxhash64 would count once instead of
  * twice — odds ~m²/2^65 per doc, and the effect is recall-only
  * (candidates feed an exact verify). TextKernelsSpec asserts
  * bit-identical signatures on real data.
  *
  * Returns NULL for docs with fewer than n tokens (no grams — the
  * aggregate form emits no row).
  */
case class SimHashWords(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects (array<string>, n >= 1), got ${child.dataType}, n=$n")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val nw = ws.numElements()
    if (nw < n) return null
    val m = nw - n + 1
    val ths = new Array[Long](m)
    val gramParts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) {
        gramParts(k) = if (ws.isNullAt(i + k)) null else ws.getUTF8String(i + k)
        k += 1
      }
      val g = UTF8String.concatWs(space, gramParts: _*)
      ths(i) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(ths)
    val sums = new Array[Int](64)
    i = 0
    while (i < m) {
      if (i == 0 || ths(i) != ths(i - 1)) {
        val th = ths(i)
        var b = 0
        while (b < 64) {
          if (((th >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ws => {
      val sRef = ctx.addReferenceObj("simhashSep", space, classOf[UTF8String].getName)
      val nw = ctx.freshName("nw")
      val m = ctx.freshName("m")
      val ths = ctx.freshName("ths")
      val sums = ctx.freshName("sums")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val g = ctx.freshName("g")
      val th = ctx.freshName("th")
      val sig = ctx.freshName("sig")
      val utf8 = classOf[UTF8String].getName
      val xxh = classOf[XXH64].getName
      val parts = (0 until n)
        .map(k => s"$ws.isNullAt($i + $k) ? null : $ws.getUTF8String($i + $k)")
        .mkString(", ")
      s"""
         |int $nw = $ws.numElements();
         |if ($nw < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = $nw - $n + 1;
         |  long[] $ths = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    $utf8 $g = $utf8.concatWs($sRef, $parts);
         |    $ths[$i] = $xxh.hashUnsafeBytes(
         |        $g.getBaseObject(), $g.getBaseOffset(), $g.numBytes(), 42L);
         |  }
         |  java.util.Arrays.sort($ths);
         |  int[] $sums = new int[64];
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($i == 0 || $ths[$i] != $ths[$i - 1]) {
         |      long $th = $ths[$i];
         |      for (int $b = 0; $b < 64; $b++) {
         |        if ((($th >>> $b) & 1L) == 1L) $sums[$b]++; else $sums[$b]--;
         |      }
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($sums[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashWords =
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

  /** `graft_simhash(ws)` defaults to n=3; `graft_simhash(ws, n)` takes
    * a foldable int literal.
    */
  def simhashBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(ws) => SimHashWords(ws, 3)
    case Seq(ws, nE) if nE.foldable =>
      SimHashWords(ws, nE.eval().asInstanceOf[Number].intValue())
    case _ =>
      throw new IllegalArgumentException(
        s"graft_simhash(array<string>[, n]) takes 1 or 2 arguments (literal int), got ${exprs.length}")
  }

  /** Idempotently register the SQL-facing kernel names on a session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", simhashBuilder, "built-in")
  }
}
