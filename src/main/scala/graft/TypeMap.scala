package graft

import org.apache.spark.sql.types._

/** The reference's entire type system is one switch over MySQL column
  * type names (/root/reference/main.go:131-148). This module encodes
  * that switch twice:
  *
  *  - [[referenceParquetType]] reproduces the reference's mapping
  *    bit-for-bit, including its quirks (SMALLINT falls through to the
  *    stringly default branch, DECIMAL degrades to binary DOUBLE,
  *    temporals become UTF8 strings, unknown types get
  *    PLAIN_DICTIONARY encoding) — used by compat mode and its tests.
  *  - [[catalystType]] is the engine's own mapping: the deliberate
  *    fidelity upgrades documented in SURVEY.md §1.4 (DecimalType is
  *    exact, temporals are typed, SMALLINT/FLOAT keep their width).
  *
  * In production the Spark JDBC source performs the equivalent of
  * catalystType automatically from ResultSetMetaData; this module is
  * the documented, testable statement of intent.
  */
object TypeMap {

  /** Reference mapping: MySQL type name → (parquet physical type,
    * optional converted-type/annotation), per main.go:131-148.
    */
  def referenceParquetType(mysqlType: String): (String, Option[String]) =
    mysqlType.toUpperCase match {
      case "TINYINT" | "INT"                  => ("INT32", None)                       // main.go:132-133
      case "BIGINT"                           => ("INT64", None)                       // main.go:134-135
      case "DECIMAL" | "DOUBLE"               => ("DOUBLE", None)                      // main.go:136-137 (DECIMAL loses exactness)
      case "DATE" | "DATETIME" | "TIMESTAMP"  => ("BYTE_ARRAY", Some("UTF8"))          // main.go:138-140 (temporals stringified)
      case "CHAR" | "VARCHAR" | "TEXT"        => ("BYTE_ARRAY", Some("UTF8"))          // main.go:141-143
      case _ => ("BYTE_ARRAY", Some("UTF8,encoding=PLAIN_DICTIONARY"))                 // main.go:144-147 (catch-all, incl. SMALLINT/FLOAT/JSON)
    }

  /** Engine mapping: MySQL type name → Catalyst type, with the
    * documented upgrades over the reference.
    */
  def catalystType(mysqlType: String, precision: Int = 10, scale: Int = 0): DataType =
    mysqlType.toUpperCase match {
      case "TINYINT" | "SMALLINT" | "MEDIUMINT" | "INT" => IntegerType
      case "BIGINT"                                     => LongType
      case "DECIMAL"                                    => DecimalType(precision, scale) // exact — upgrade over main.go:136
      case "FLOAT"                                      => FloatType                     // upgrade over default-branch string
      case "DOUBLE"                                     => DoubleType
      case "DATE"                                       => DateType                      // upgrade over main.go:138-140
      case "DATETIME" | "TIMESTAMP"                     => TimestampType                 // upgrade over main.go:138-140
      case "CHAR" | "VARCHAR" | "TEXT" | "JSON" | "ENUM" | "SET" => StringType
      case "BLOB" | "BINARY" | "VARBINARY"              => BinaryType
      case _                                            => StringType
    }
}
