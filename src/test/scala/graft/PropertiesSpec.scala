package graft

import graft.functions.Extensibility
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based coverage (SURVEY.md §5.2(3)): totality of the type
  * map, validation algebra, signature-min algebra. Raw ScalaCheck
  * (no scalatest bridge in the offline dependency set).
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val known = Set(
    "TINYINT", "INT", "BIGINT", "DECIMAL", "DOUBLE", "DATE", "DATETIME",
    "TIMESTAMP", "CHAR", "VARCHAR", "TEXT")

  test("referenceParquetType is total and unknown types hit the dictionary default") {
    check(Prop.forAll(Gen.alphaUpperStr) { t =>
      val (phys, conv) = TypeMap.referenceParquetType(t)
      val legalPhys = Set("INT32", "INT64", "DOUBLE", "BYTE_ARRAY").contains(phys)
      val defaultOk = known.contains(t.toUpperCase) ||
        (phys == "BYTE_ARRAY" && conv.contains("UTF8,encoding=PLAIN_DICTIONARY"))
      legalPhys && defaultOk
    })
  }

  test("catalystType is total — never throws on arbitrary type names") {
    check(Prop.forAll(Gen.asciiPrintableStr) { t =>
      TypeMap.catalystType(t)
      true
    })
  }

  test("SignatureMin merge is order-insensitive and reduce is idempotent") {
    val agg = new Extensibility.SignatureMin(4)
    val sigGen: Gen[Seq[Long]] =
      Gen.listOfN(4, Gen.choose(Long.MinValue + 1, Long.MaxValue)).map(_.toIndexedSeq)
    check(Prop.forAll(sigGen, sigGen) { (a, b) =>
      val ab = agg.merge(agg.reduce(agg.zero, a), agg.reduce(agg.zero, b)).toSeq
      val ba = agg.merge(agg.reduce(agg.zero, b), agg.reduce(agg.zero, a)).toSeq
      val twice = agg.reduce(agg.reduce(agg.zero, a), a).toSeq
      ab == ba && twice == agg.reduce(agg.zero, a).toSeq
    })
  }

  test("combo-band pigeonhole: any pair within hamming 13 shares a 3-block key") {
    // Bit-level replication of TextSim.simhashComboBands' key
    // arithmetic (acc*16 + 4-bit block, over all C(16,3) selections):
    // the deterministic-recall theorem q63 relies on, checked on
    // random signatures with up to 13 random bit flips.
    val combos = (0 until 16).combinations(3).map(_.toArray).toArray
    def keys(sig: Long): Array[Long] =
      combos.map(_.foldLeft(0L)((acc, i) => acc * 16 + ((sig >>> (i * 4)) & 15L)))
    val gen = for {
      sig <- Gen.choose(Long.MinValue, Long.MaxValue)
      k <- Gen.choose(0, 13)
      flips <- Gen.listOfN(k, Gen.choose(0, 63))
    } yield (sig, flips.foldLeft(sig)((s, b) => s ^ (1L << b)))
    check(Prop.forAll(gen) { case (a, b) =>
      keys(a).zip(keys(b)).exists { case (x, y) => x == y }
    })
  }

  test("CLI parse round-trips flag values in both --k=v and --k v forms") {
    val v = Gen.alphaNumStr.suchThat(_.nonEmpty)
    check(Prop.forAll(v, v, v, v) { (pw, db, q, out) =>
      val eq = Mysql2ParquetMain.parse(Array(
        s"--password=$pw", s"--database=$db", s"--query=$q", s"--parquet=$out"))
      val sp = Mysql2ParquetMain.parse(Array(
        "--password", pw, "--database", db, "--query", q, "--parquet", out))
      eq == sp && (eq match {
        case Right(c) =>
          c.password == pw && c.database == db && c.query == q && c.parquet == out
        case Left(_) => false
      })
    })
  }

  test("unknown boolean flag values are always usage errors, never silently true") {
    val bad = Gen.alphaNumStr.suchThat(s =>
      !Set("1", "t", "T", "true", "TRUE", "True",
           "0", "f", "F", "false", "FALSE", "False").contains(s))
    check(Prop.forAll(bad) { v =>
      Mysql2ParquetMain.parse(Array("--password=p", "--database=d",
        "--query=q", "--parquet=o", s"--compat=$v")) match {
        case Left((text, 1)) => text.contains("not a boolean")
        case _ => false
      }
    })
  }

  test("Config validation accepts exactly the complete flag sets") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr, Gen.alphaNumStr, Gen.alphaNumStr) {
      (pw, db, q, out) =>
        val c = Mysql2Parquet.Config(password = pw, database = db, query = q, parquet = out)
        c.validate.isRight == Seq(pw, db, q, out).forall(_.nonEmpty)
    })
  }

  test("q125 closed-form interleave position equals the row_number definition on arbitrary source mixes") {
    // pos(r, s) = Σ_s' min(r-1, n_s') + |{s' ≤ s : n_s' ≥ r}| must
    // reproduce row_number() over (ORDER BY r, s) for ANY per-source
    // count distribution — the algebra the operator substitutes for a
    // second global ranking pass.
    val mixGen: Gen[Map[String, Int]] =
      Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(6)), Gen.choose(1, 40)))
        .suchThat(_.nonEmpty)
    check(Prop.forAll(mixGen) { mix =>
      val rows = for ((s, n) <- mix.toSeq; r <- 1 to n) yield (r, s)
      val byOrder = rows.sortBy { case (r, s) => (r, s) }
      val rowNumber = byOrder.zipWithIndex
        .map { case (rs, i) => rs -> (i + 1L) }.toMap
      rows.forall { case (r, s) =>
        val closed = mix.values.map(n => math.min(r - 1L, n.toLong)).sum +
          mix.count { case (s2, n2) => s2 <= s && n2 >= r }
        closed == rowNumber((r, s))
      }
    })
  }

  test("BloomKit never false-negatives: every inserted value probes true, for arbitrary string sets") {
    // The guarantee q142 and the streaming dedup gate lean on: a
    // candidate set that MISSES a true member silently loses data.
    // Probed through the same sketch classes the SQL functions build
    // (XxHash64 value path), driverside — no Spark session needed.
    val setGen = Gen.nonEmptyListOf(Gen.asciiPrintableStr).map(_.toSet)
    check(Prop.forAll(setGen) { items =>
      val bf = org.apache.spark.util.sketch.BloomFilter.create(
        math.max(items.size.toLong, 8L), 0.03)
      items.foreach(s => bf.putLong(xx64(s)))
      items.forall(s => bf.mightContainLong(xx64(s)))
    })
  }

  private def xx64(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBytes("UTF-8"), org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      s.getBytes("UTF-8").length, 42L)

  test("hamming-2 multiprobe mask set equals the bit_count(xor) <= 2 ball (q118 oracle equivalence)") {
    // The q118 DuckDB oracle takes candidates via bit_count(xor(sq, sc))
    // <= 2 while the Spark plan probes the explicit 37-mask set
    // {sig} u {sig^bit} u {sig^(bi|bj)}; this is the exact equivalence
    // that makes the oracle legitimate, checked for every 8-bit sig.
    val masks = Seq(0) ++ (0 until 8).map(1 << _) ++
      (for (i <- 0 until 8; j <- i + 1 until 8) yield (1 << i) | (1 << j))
    assert(masks.length === 37)
    check(Prop.forAll(Gen.choose(0, 255)) { sig =>
      val probed = masks.map(sig ^ _).toSet
      val ball = (0 to 255).filter(t => Integer.bitCount(sig ^ t) <= 2).toSet
      probed == ball
    })
  }

  test("%.17E literals round-trip arbitrary doubles bit-exactly (q118/q258 plane embedding)") {
    // The LSH oracle ships the JVM's gaussian plane constants as SQL
    // text; the whole scheme rests on parse(format(d)) == d bitwise.
    val gen = Gen.choose(Long.MinValue, Long.MaxValue)
      .map(java.lang.Double.longBitsToDouble)
      .suchThat(d => !d.isNaN && !d.isInfinite)
    check(Prop.forAll(gen) { d =>
      val lit = "%.17E".formatLocal(java.util.Locale.ROOT, d)
      java.lang.Double.doubleToRawLongBits(java.lang.Double.parseDouble(lit)) ==
        java.lang.Double.doubleToRawLongBits(d)
    })
  }

  test("bounded-training threshold: 8-hex lowercase, clamped, monotone in cap·k/n") {
    val gen = for {
      n   <- Gen.chooseNum(1L, 1000000000000L)
      k   <- Gen.chooseNum(1, 1000000)
      cap <- Gen.chooseNum(1, 100000)
    } yield (n, k, cap)
    check(Prop.forAll(gen) { case (n, k, cap) =>
      val t = graft.ops.VectorOps.trainThrHex(n, k, cap)
      // fixed-width lowercase hex — the form under which lexicographic
      // string compare IS numeric compare, the invariant the md5-prefix
      // predicate rests on in both engines
      val wellFormed = t.length == 8 && t.forall(c => c.isDigit || ('a' to 'f').contains(c))
      // cap·k >= n must admit everything (the non-binding identity law)
      val allPassLaw = cap.toLong * k < n || t == "ffffffff"
      // a bigger cap can never shrink the sample (string >= = numeric
      // >= by wellFormed)
      val mono = graft.ops.VectorOps.trainThrHex(n, k, cap + 1) >= t
      wellFormed && allPassLaw && mono
    })
  }
}
