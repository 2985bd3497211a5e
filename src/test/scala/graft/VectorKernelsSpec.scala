package graft

import graft.functions.VectorKernels
import org.apache.spark.sql.functions._

/** The native DotProduct kernel must be arithmetically identical to the
  * higher-order aggregate(zip_with(...)) formulation (same widening,
  * same accumulation order) — that identity is what lets the vector ops
  * keep their DuckDB oracles after swapping in the codegen'd kernel.
  */
class VectorKernelsSpec extends SparkSpec {

  test("graft_dot is bit-identical to the higher-order formulation on float arrays") {
    VectorKernels.ensureRegistered(spark)
    val e = T.embeddings(spark, sf001).limit(50)
    val both = e.select(
      expr("graft_dot(embedding, embedding)").as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, x) -> a + x)").as("ho"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot handles mixed float/double inputs and nulls") {
    VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0d, 4.0d)),
      (Seq(0.5f, 0.5f), Seq(2.0d, 2.0d))).toDF("f", "dd")
    val got = df.select(expr("graft_dot(f, dd)")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(11.0, 2.0))
    val withNull = df.select(expr("graft_dot(f, CAST(NULL AS ARRAY<DOUBLE>))")).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("graft_sub is bit-identical to the higher-order zip_with subtraction") {
    VectorKernels.ensureRegistered(spark)
    val e = T.embeddings(spark, sf001).limit(50)
    val c = T.embeddings(spark, sf001).orderBy(col("vec_id")).limit(1)
      .select(col("embedding").as("cv"))
    val both = e.crossJoin(broadcast(c)).select(
      expr("graft_dot(graft_sub(embedding, cv), graft_sub(embedding, cv))").as("native"),
      expr("aggregate(zip_with(embedding, cv, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (a, x) -> a + x)").as("ho"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // mixed float/double and null propagation, like graft_dot
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0d, 4.0d))).toDF("f", "dd")
    val got = df.select(expr("graft_sub(f, dd)")).collect()
      .map(_.getSeq[Double](0).toSeq)
    assert(got.toSeq == Seq(Seq(-2.0, -2.0)))
    assert(df.select(expr("graft_sub(f, CAST(NULL AS ARRAY<DOUBLE>))"))
      .collect().forall(_.isNullAt(0)))
  }

  test("graft_dot rejects non-array inputs at analysis time") {
    VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    val ex = intercept[Exception](df.select(expr("graft_dot(a, b)")).collect())
    assert(ex.getMessage.toLowerCase.contains("graft_dot") ||
           ex.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("kernels fail loudly on mismatched lengths and null elements (strict domain)") {
    // Round-9 advisor ask: the bit-identity claim vs zip_with only
    // holds on equal-length, null-free arrays — outside that domain
    // the kernels used to silently truncate to min(length) and read a
    // null slot as 0.0. Both paths (interpreted via the codegen'd
    // whole-stage pipeline is exercised here; the nullSafeEval path
    // via a literal fold below) must now throw with the kernel named.
    VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    val uneven = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0d, 2.0d))).toDF("f", "dd")
    Seq("graft_dot(f, dd)", "graft_sub(f, dd)").foreach { fn =>
      val ex = intercept[Exception](uneven.select(expr(fn)).collect())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("differ in length")), s"$fn: ${ex.getMessage}")
    }
    val nully = Seq((Seq[java.lang.Float](1.0f, null, 3.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("f", "g")
    Seq("graft_dot(f, g)", "graft_sub(f, g)").foreach { fn =>
      val ex = intercept[Exception](nully.select(expr(fn)).collect())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("null element")), s"$fn: ${ex.getMessage}")
    }
    // a whole-array NULL still null-propagates (BinaryExpression
    // nullSafeEval contract, unchanged)
    assert(uneven.select(expr("graft_dot(f, CAST(NULL AS ARRAY<DOUBLE>))"))
      .collect().forall(_.isNullAt(0)))
  }

  test("graft_hdrot is an exact orthogonal rotation with the strict kernel domain") {
    VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    // R = H·D/√n orthogonal ⇒ dot products (hence L2 distances and
    // norms) are preserved up to the butterfly's O(ulp) rounding —
    // the property q266's raw-space exact reference rests on.
    val signs = graft.ops.VectorOps.hdSigns.toSeq
    val e = T.embeddings(spark, sf001).limit(100)
      .select(col("vec_id"), col("embedding"))
    val rot = e.select(
      expr("graft_dot(embedding, embedding)").as("raw"),
      call_udf("graft_dot",
        call_udf("graft_hdrot", col("embedding"), typedlit(signs)),
        call_udf("graft_hdrot", col("embedding"), typedlit(signs))).as("rotn"))
      .collect()
    rot.foreach { r =>
      val (a, b) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
        s"norm not preserved: $a vs $b")
    }
    // double application: H·D·H·D is NOT identity (D and H don't
    // commute) but stays an isometry — norms preserved again
    val twice = e.limit(5).select(
      expr("graft_dot(embedding, embedding)").as("raw"),
      call_udf("graft_dot",
        call_udf("graft_hdrot", call_udf("graft_hdrot", col("embedding"), typedlit(signs)), typedlit(signs)),
        call_udf("graft_hdrot", call_udf("graft_hdrot", col("embedding"), typedlit(signs)), typedlit(signs))).as("rotn"))
      .collect()
    twice.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1e-9 * math.max(1.0, r.getDouble(0))))
    // closed-form check: kernel butterfly equals the direct
    // H[j][i] = (−1)^popcount(j&i) sum the DuckDB oracle computes
    val sample = e.limit(3).select(col("embedding"),
      call_udf("graft_hdrot", col("embedding"), typedlit(signs))).collect()
    sample.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val got = r.getSeq[Double](1).toArray
      val sg = graft.ops.VectorOps.hdSigns
      (0 until 64).foreach { j =>
        var s = 0.0
        (0 until 64).foreach { i =>
          val h = if (java.lang.Integer.bitCount(j & i) % 2 == 0) 1.0 else -1.0
          s += h * sg(i) * v(i).toDouble
        }
        s /= 8
        assert(math.abs(s - got(j)) <= 1e-12 * math.max(1.0, math.abs(s)),
          s"dim $j: closed form $s vs kernel ${got(j)}")
      }
    }
    // strict domain: non-power-of-two length throws with the kernel named
    val odd = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0d, 1.0d, 1.0d))).toDF("f", "s")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val ex = intercept[Exception](odd.select(expr("graft_hdrot(f, s)")).collect())
    assert(msgs(ex).exists(_.contains("power of two")), ex.getMessage)
    val uneven2 = Seq((Seq(1.0f, 2.0f), Seq(1.0d, 1.0d, 1.0d, 1.0d))).toDF("f", "s")
    val ex2 = intercept[Exception](uneven2.select(expr("graft_hdrot(f, s)")).collect())
    assert(msgs(ex2).exists(_.contains("differ in length")), ex2.getMessage)
  }

  test("graft_matvec matches the per-output-dim driver recompute with the strict kernel domain") {
    VectorKernels.ensureRegistered(spark)
    import spark.implicits._
    // dense mat-vec against a known matrix: y_i = Σ_j M[i*n+j]·x_j,
    // accumulated left-to-right — the arithmetic the q288 oracle's
    // per-dim sums replay (up to sum-order ulps; here n is small
    // enough that the driver recompute in the same order is exact)
    val mFlat = (0 until 9).map(k => (k + 1).toDouble)      // 3×3 row-major
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "x")
    val got = df.select(call_udf("graft_matvec", typedlit(mFlat), col("x")))
      .collect().head.getSeq[Double](0)
    assert(got == Seq(14.0, 32.0, 50.0))                     // [1 2 3; 4 5 6; 7 8 9]·[1 2 3]
    // identity matrix: exact pass-through (float widened to double)
    val idFlat = (for (i <- 0 until 64; j <- 0 until 64)
      yield if (i == j) 1.0 else 0.0).toIndexedSeq
    val e = T.embeddings(spark, sf001).limit(20)
    e.select(col("embedding"),
        call_udf("graft_matvec", typedlit(idFlat), col("embedding")).as("y"))
      .collect().foreach { r =>
        assert(r.getSeq[Float](0).map(_.toDouble) == r.getSeq[Double](1))
      }
    // strict domain: |M| must be exactly |x|²
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val bad = Seq((Seq(1.0f, 2.0f), Seq(1.0d, 2.0d, 3.0d))).toDF("x", "m")
    val ex = intercept[Exception](bad.select(expr("graft_matvec(m, x)")).collect())
    assert(msgs(ex).exists(_.contains("expected")), ex.getMessage)
  }
}
