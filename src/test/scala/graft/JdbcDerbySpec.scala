package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Live JDBC export path against embedded Derby (the sandbox has no
  * MySQL; Derby ships with Spark's jars) — real connections end to end:
  * schema inference from ResultSetMetaData, value round-trip,
  * sessionInitStatement execution, partitioned scans, NULL handling
  * through the compat projection, and the parquet write. Upgrades the
  * reference's N2/N3/N6 surface (main.go:87-121) from config-only
  * plumbing tests to an executed pipeline.
  */
class JdbcDerbySpec extends SparkSpec {

  // Derby resolves unqualified names against the connection user's
  // schema, so both the seeding connection and Spark's reader connect
  // as the reference's default user (root).
  private val dbUrl = "jdbc:derby:memory:graftjdbc"

  // Per-run temp output dir (not a fixed /tmp path): aborted or
  // concurrent runs can't leave a stale-schema parquet behind.
  private lazy val outDir = java.nio.file.Files
    .createTempDirectory("graft-jdbc-out").resolve("t").toString

  private def conf(query: String) = Mysql2Parquet.Config(
    password = "pw", database = "memory:graftjdbc", query = query,
    parquet = outDir, url = Some(dbUrl))

  private lazy val seeded: Unit = {
    val c = DriverManager.getConnection(dbUrl + ";create=true;user=root")
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE people (
        |  id BIGINT NOT NULL,
        |  age INT,
        |  name VARCHAR(50),
        |  score DOUBLE,
        |  balance DECIMAL(10,2),
        |  born DATE,
        |  seen TIMESTAMP
        |)""".stripMargin)
    st.execute(
      """INSERT INTO people VALUES
        |(1, 34, 'ada', 1.5, 100.25, DATE('1990-02-01'), TIMESTAMP('2026-01-01 10:00:00')),
        |(2, NULL, NULL, NULL, NULL, NULL, NULL),
        |(3, 61, 'grace', -2.0, 0.10, DATE('1961-07-01'), TIMESTAMP('2026-02-03 04:05:06')),
        |(4, 7, 'linus', 0.0, 9999999.99, DATE('2001-12-31'), TIMESTAMP('2026-03-04 05:06:07'))""".stripMargin)
    st.execute("CREATE TABLE init_log (marker INT)")
    st.close(); c.close()
  }

  test("schema is inferred from ResultSetMetaData with real JDBC types") {
    seeded
    val df = Mysql2Parquet.reader(spark, conf("SELECT * FROM people")).load()
    val types = df.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(types("id") === LongType)
    assert(types("age") === IntegerType)
    assert(types("name") === StringType)
    assert(types("score") === DoubleType)
    assert(types("balance") === DecimalType(10, 2))
    assert(types("born") === DateType)
    assert(types("seen") === TimestampType)
  }

  test("values and SQL NULLs round-trip through the live read") {
    seeded
    val rows = Mysql2Parquet.reader(spark, conf("SELECT id, age, name FROM people"))
      .load().collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .sortBy(_._1)
    assert(rows === Array(
      (1L, Some(34), Some("ada")),
      (2L, None, None),
      (3L, Some(61), Some("grace")),
      (4L, Some(7), Some("linus"))))
  }

  test("arbitrary SQL is pushed to the database, not just table scans") {
    seeded
    val df = Mysql2Parquet.reader(spark, conf(
      "SELECT name, age * 2 AS age2 FROM people WHERE age > 30")).load()
    val got = df.collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    assert(got === Array(("ada", 68), ("grace", 122)))
  }

  test("aggregates and limits push down to the live database (DSv2 JDBC catalog)") {
    seeded
    // The reference's entire performance model is "the server computes,
    // the client streams" (main.go:106 delegates the whole query to
    // MySQL). Spark's v2 JDBC catalog recovers exactly that for
    // aggregates: with pushDownAggregate the GROUP BY/count run inside
    // the database and only the aggregated rows cross the wire.
    spark.conf.set("spark.sql.catalog.derby",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.derby.url", dbUrl + ";user=root")
    spark.conf.set("spark.sql.catalog.derby.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.derby.pushDownLimit", "true")
    val agg = spark.sql(
      "SELECT count(*) AS n, min(age) AS mn, max(age) AS mx FROM derby.ROOT.PEOPLE")
    val scan = agg.queryExecution.executedPlan.toString
    assert(scan.contains("PushedAggregates"), s"no pushed aggregates in:\n$scan")
    val r = agg.collect().head
    assert(r.getLong(0) == 4L && r.getInt(1) == 7 && r.getInt(2) == 61)
    // pushDownLimit is set but DerbyDialect doesn't implement limit
    // clauses (MySQLDialect does — it emits LIMIT n); the query must
    // still answer correctly with the limit applied Spark-side.
    val lim = spark.sql("SELECT id FROM derby.ROOT.PEOPLE LIMIT 2")
    assert(lim.count() == 2)
  }

  test("sessionInitStatement executes on the scan connection") {
    seeded
    val cfg = conf("SELECT id FROM people")
      .copy(sessionInit = Some("INSERT INTO init_log VALUES (42)"))
    val n = Mysql2Parquet.reader(spark, cfg).load().count()
    assert(n === 4)
    val c = DriverManager.getConnection(dbUrl + ";user=root")
    val rs = c.createStatement().executeQuery("SELECT count(*) FROM init_log")
    rs.next()
    assert(rs.getInt(1) >= 1, "sessionInitStatement left no trace")
    c.close()
  }

  test("partitioned scan splits the query across real connections") {
    seeded
    val cfg = conf("SELECT id, name FROM people").copy(
      partitionColumn = Some("id"), numPartitions = 3,
      lowerBound = 1L, upperBound = 5L)
    val df = Mysql2Parquet.reader(spark, cfg).load()
    assert(df.rdd.getNumPartitions === 3)
    assert(df.select("id").collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L, 4L))
  }

  test("inline SET prefix in --query runs live, like the reference's multiStatements") {
    seeded
    // The reference's documented workflow is SET statements INSIDE the
    // query string (help text main.go:41-47). Derby's SET ISOLATION is
    // the local analog of the reference's SET TRANSACTION ISOLATION
    // example; if the splitter were absent this whole string would be
    // submitted as one JDBC query and fail to parse.
    val rows = Mysql2Parquet.reader(spark,
      conf("SET ISOLATION READ UNCOMMITTED; SELECT id, name FROM people"))
      .load().collect()
    assert(rows.length === 4)
  }

  test("JDBC write-back: a DataFrame lands in a live table and reads back") {
    seeded
    val out = T.nation(spark, sf001).select(
      col("n_nationkey").as("id"), col("n_name").as("name"))
    out.write.mode("overwrite")
      .option("url", dbUrl + ";user=root").option("dbtable", "nations_out")
      .format("jdbc").save()
    // Spark's JDBC writer quotes identifiers, making them
    // case-sensitive in Derby — quote them back when reading.
    val back = Mysql2Parquet.reader(spark,
      conf("""SELECT "id", "name" FROM nations_out""")).load()
    assert(back.count() === out.count())
    assert(back.select("name").collect().map(_.getString(0)).sorted ===
      out.select("name").collect().map(_.getString(0)).sorted)
  }

  test("live read -> compat projection -> parquet write round-trips") {
    seeded
    val cfg = conf("SELECT id, age, name FROM people").copy(compat = true)
    val src = Mysql2Parquet.reader(spark, cfg).load()
    Mysql2Parquet.run(src, cfg)
    val back = spark.read.parquet(cfg.parquet)
    // compat mode: everything stringified, NULL collapsed to "" —
    // the reference's exact output semantics (main.go:175-195).
    assert(back.schema.fields.forall(_.dataType === StringType))
    val byId = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(byId(1) === (("2", "", "")))
    assert(byId(0) === (("1", "34", "ada")))
  }
}
