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

  test("Config validation accepts exactly the complete flag sets") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr, Gen.alphaNumStr, Gen.alphaNumStr) {
      (pw, db, q, out) =>
        val c = Mysql2Parquet.Config(password = pw, database = db, query = q, parquet = out)
        c.validate.isRight == Seq(pw, db, q, out).forall(_.nonEmpty)
    })
  }
}
