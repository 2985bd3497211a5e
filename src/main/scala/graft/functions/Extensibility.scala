package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** UDF / UDAF extension surface — absent from the reference (no
  * extension mechanism at all; SURVEY.md §2.2), specified here as the
  * engine's escape hatch. House rule, per the 100 TB posture: built-in
  * `functions._` first (codegen'd), typed `Aggregator` via
  * `functions.udaf` second, scalar Scala `udf` last (breaks codegen and
  * nullability inference). Every operator in graft.ops honors that rule
  * — the objects here exist so the surface itself is specified and
  * tested, and for genuine custom aggregation needs.
  */
object Extensibility {

  /** Typed Aggregator: element-wise minimum over fixed-width Long
    * signature vectors — the MinHash signature-union aggregation from
    * SURVEY.md §7.4, usable to fold per-shingle hash vectors into a
    * per-document MinHash signature in one pass. Buffer is a mutable
    * primitive array: merge is O(width), shuffle carries one buffer per
    * group per partition (standard partial-aggregation contract).
    */
  final class SignatureMin(width: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(width)(Long.MaxValue)
    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < width) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < width) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  private val seqLongEnc: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form of [[SignatureMin]] via functions.udaf. */
  def signatureMin(width: Int)(sigs: Column): Column =
    functions.udaf(new SignatureMin(width), seqLongEnc).apply(sigs)

  /** Scalar udf example (the discouraged tier, shown for surface
    * completeness): URL-slug normalization.
    */
  val slugify = functions.udf((s: String) =>
    if (s == null) null
    else s.trim.toLowerCase.replaceAll("[^a-z0-9]+", "-").stripPrefix("-").stripSuffix("-"))

  /** Register the SQL-facing names on a session. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("slugify", slugify)
    spark.udf.register("sig_min128", functions.udaf(new SignatureMin(128), seqLongEnc))
  }
}
