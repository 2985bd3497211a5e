package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** One case per branch of the reference's type switch
  * (/root/reference/main.go:131-148), including the documented quirks
  * (FIXTURES.md family B).
  */
class TypeMapSpec extends AnyFunSuite {
  import TypeMap._

  test("reference mapping: INT32 branch (main.go:132-133)") {
    assert(referenceParquetType("TINYINT") == ("INT32", None))
    assert(referenceParquetType("INT") == ("INT32", None))
  }

  test("reference mapping: INT64 branch (main.go:134-135)") {
    assert(referenceParquetType("BIGINT") == ("INT64", None))
  }

  test("reference mapping: DOUBLE branch, DECIMAL is lossy (main.go:136-137)") {
    assert(referenceParquetType("DECIMAL") == ("DOUBLE", None))
    assert(referenceParquetType("DOUBLE") == ("DOUBLE", None))
  }

  test("reference mapping: temporals stringified (main.go:138-140)") {
    for (t <- Seq("DATE", "DATETIME", "TIMESTAMP"))
      assert(referenceParquetType(t) == ("BYTE_ARRAY", Some("UTF8")))
  }

  test("reference mapping: character types (main.go:141-143)") {
    for (t <- Seq("CHAR", "VARCHAR", "TEXT"))
      assert(referenceParquetType(t) == ("BYTE_ARRAY", Some("UTF8")))
  }

  test("reference mapping: default branch gets dictionary encoding, SMALLINT falls through (main.go:144-147)") {
    for (t <- Seq("SMALLINT", "FLOAT", "BLOB", "JSON", "ENUM", "SET", "BIT", "TIME", "YEAR"))
      assert(referenceParquetType(t) == ("BYTE_ARRAY", Some("UTF8,encoding=PLAIN_DICTIONARY")))
  }

  test("engine mapping upgrades: exact decimal, typed temporals, kept widths") {
    assert(catalystType("DECIMAL", 12, 2) == DecimalType(12, 2))
    assert(catalystType("DATE") == DateType)
    assert(catalystType("DATETIME") == TimestampType)
    assert(catalystType("SMALLINT") == IntegerType) // not stringified
    assert(catalystType("FLOAT") == FloatType)      // not stringified
    assert(catalystType("JSON") == StringType)
    assert(catalystType("BLOB") == BinaryType)
  }
}
