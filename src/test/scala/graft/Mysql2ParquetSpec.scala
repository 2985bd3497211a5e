package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pipeline semantics: flag validation (main.go:68-85), compat
  * projection (NULL→"" collapse, main.go:183-184), JDBC option
  * construction, and the parquet round-trip.
  */
class Mysql2ParquetSpec extends SparkSpec {
  import Mysql2Parquet._

  test("validate requires the reference's four mandatory flags") {
    assert(Config().validate.isLeft)
    val err = Config(password = "x").validate.left.getOrElse("")
    assert(err.contains("database") && err.contains("query") && err.contains("parquet"))
    assert(Config(password = "x", database = "d", query = "select 1",
                  parquet = "/tmp/x.parquet").validate.isRight)
  }

  test("jdbc url mirrors the reference DSN host/port/db (main.go:89)") {
    val c = Config(host = "db.example", port = 3307, database = "prod")
    assert(c.jdbcUrl == "jdbc:mysql://db.example:3307/prod?characterEncoding=utf8&allowMultiQueries=true")
  }

  test("reader carries query, sessionInit and partitioning options without touching the network") {
    val c = Config(password = "x", database = "d", query = "SELECT 1",
      parquet = "/tmp/x", sessionInit = Some("SET SQL_BIG_SELECTS=1"),
      partitionColumn = Some("id"), numPartitions = 8, upperBound = 100)
    reader(spark, c) // construction must not connect
    succeed
  }

  test("compat projection stringifies everything and collapses NULL to empty string") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType),
      StructField("d", DoubleType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Integer.valueOf(1), "a", java.lang.Double.valueOf(2.5)),
        Row(null, null, null),
        Row(Integer.valueOf(3), "", java.lang.Double.valueOf(0.0))),
      schema)
    val out = compatProjection(df)
    assert(out.schema.fields.forall(_.dataType == StringType))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(1) == (("", "", "")))            // NULL → "" (main.go:183-184)
    assert(rows(2)._2 == "")                     // "" and NULL are indistinguishable
    assert(rows(0) == (("1", "a", "2.5")))
  }

  test("snapshotMerge: latest version wins, deletes drop, inserts add, delete-then-reinsert survives (q146)") {
    import spark.implicits._
    // Planted CDC history over 5 keys; (pk, version) unique per contract.
    val base = Seq(
      (1L, "a0", 0L, "I"),   // untouched — passes through
      (2L, "b0", 0L, "I"),   // updated twice — v2 payload must win
      (3L, "c0", 0L, "I"),   // deleted — must vanish
      (4L, "d0", 0L, "I")    // deleted at v1, reinserted at v2 — must survive as d2
    ).toDF("pk", "v", "version", "op")
    val delta = Seq(
      (2L, "b1", 1L, "U"), (2L, "b2", 2L, "U"),
      (3L, "gone", 1L, "D"),
      (4L, "x", 1L, "D"), (4L, "d2", 2L, "I"),
      (5L, "e1", 1L, "I")    // fresh key, insert only
    ).toDF("pk", "v", "version", "op")
    val out = graft.ops.Relational.snapshotMerge(base, delta, "pk", "version", "op")
      .orderBy("pk").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a0"), (2L, "b2"), (4L, "d2"), (5L, "e1")))
    // Empty delta is the no-op compaction: output == base payload.
    val noop = graft.ops.Relational.snapshotMerge(base, delta.limit(0), "pk", "version", "op")
      .orderBy("pk").as[(Long, String)].collect().toSeq
    assert(noop == Seq((1L, "a0"), (2L, "b0"), (3L, "c0"), (4L, "d0")))
  }

  test("scdHistory: intervals chain, deletes close without emitting, reinsert opens a new interval (q147)") {
    import spark.implicits._
    val events = Seq(
      (1L, "a0", 0L, "I"),                         // lone insert — current
      (2L, "b0", 0L, "I"), (2L, "b1", 1L, "U"),    // chain: [0,1), [1,∞) current
      (3L, "c0", 0L, "I"), (3L, "x", 1L, "D"),     // delete closes [0,1), no row after
      (4L, "d0", 0L, "I"), (4L, "x", 1L, "D"), (4L, "d2", 2L, "I") // reinsert: [0,1), [2,∞)
    ).toDF("pk", "v", "version", "op")
    val h = graft.ops.Relational.scdHistory(events, "pk", "version", "op")
      .select("pk", "v", "valid_from", "valid_to", "is_current")
      .orderBy("pk", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(h == Seq(
      (1L, "a0", 0L, None, true),
      (2L, "b0", 0L, Some(1L), false), (2L, "b1", 1L, None, true),
      (3L, "c0", 0L, Some(1L), false),
      (4L, "d0", 0L, Some(1L), false), (4L, "d2", 2L, None, true)))
    // Invariant tying the pair together: is_current SCD2 rows == the
    // q146 compaction of the same event stream (payload equality).
    val current = h.filter(_._5).map(r => (r._1, r._2))
    val merged = graft.ops.Relational
      .snapshotMerge(events.limit(0), events, "pk", "version", "op")
      .orderBy("pk").as[(Long, String)].collect().toSeq
    assert(current == merged)
  }

  test("snapshotDiff classifies added/removed/changed/same; NULL payload flips are changed, not same (q157)") {
    import spark.implicits._
    val before = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("c")), (4L, Option.empty[String])
    ).toDF("pk", "v")
    val after = Seq(
      (1L, Option("a")),          // same
      (2L, Option.empty[String]), // changed (value → NULL must not read as same)
      (4L, Option.empty[String]), // same (NULL <=> NULL)
      (5L, Option("e"))           // added; pk 3 removed
    ).toDF("pk", "v")
    val out = graft.ops.Relational.snapshotDiff(before, after, "pk", Seq("v"))
      .orderBy("change_kind").as[(String, Long)].collect().toSeq
    assert(out == Seq(("added", 1L), ("changed", 1L), ("removed", 1L), ("same", 2L)))
  }

  test("asOf(history, v) equals compacting only events with version <= v, for every v (q158)") {
    import spark.implicits._
    val events = Seq(
      (1L, "a0", 0L, "I"),
      (2L, "b0", 0L, "I"), (2L, "b1", 1L, "U"),
      (3L, "c0", 0L, "I"), (3L, "x", 1L, "D"),
      (4L, "d0", 0L, "I"), (4L, "x", 1L, "D"), (4L, "d2", 2L, "I"),
      (5L, "e1", 1L, "I")
    ).toDF("pk", "v", "version", "op")
    val history = graft.ops.Relational.scdHistory(events, "pk", "version", "op")
    for (ver <- 0L to 2L) {
      val travel = graft.ops.Relational.asOf(history, ver)
        .orderBy("pk").as[(Long, String)].collect().toSeq
      val compact = graft.ops.Relational
        .snapshotMerge(events.limit(0), events.filter($"version" <= ver), "pk", "version", "op")
        .orderBy("pk").as[(Long, String)].collect().toSeq
      assert(travel == compact, s"AS OF $ver must equal prefix compaction")
    }
  }

  test("run writes parquet; compat+singleFile yields one data file like the reference") {
    val out = java.nio.file.Files.createTempDirectory("m2p").toString + "/out"
    val src = T.customer(spark, sf001)
    Mysql2Parquet.run(src, Config(password = "x", database = "d", query = "q",
      parquet = out, compat = true, singleFile = true))
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    assert(back.schema.fields.forall(_.dataType == StringType))
  }
}
