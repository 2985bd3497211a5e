package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make graft_dot available to a session that
  * never called VectorKernels.ensureRegistered — the catalog-level
  * registration path a cluster configures via spark.sql.extensions.
  *
  * The suite cycles the shared session (suites run sequentially in the
  * forked test JVM) and restores a default-config session afterwards so
  * later suites are unaffected.
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions registers graft_dot without manual calls") {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = ext.sql(
        "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(got === 32.0)
      // visible in the function catalog, not just resolvable
      assert(ext.catalog.functionExists("graft_dot"))
      // the bloom build/probe pair rides the same injection: build a
      // filter over 3 values in SQL, probe hits and a miss
      val probes = ext.sql(
        """WITH b AS (SELECT graft_bloom_agg(x, 1024) AS bf
          |           FROM (VALUES ('a'), ('b'), ('c')) t(x))
          |SELECT graft_might_contain((SELECT bf FROM b), y) AS hit
          |FROM (VALUES ('a'), ('c'), ('zzz-not-inserted')) p(y)""".stripMargin)
        .collect().map(_.getBoolean(0)).toSeq
      assert(probes(0) && probes(1), "inserted values must probe true")
      assert(ext.catalog.functionExists("graft_bloom_agg"))
      assert(ext.catalog.functionExists("graft_might_contain"))
      // the text sketch kernels ride the same injection
      val sig = ext.sql(
        "SELECT graft_minhash(array('a','b','c','d')) AS s, " +
        "graft_simhash(array('a','b','c','d')) AS h")
        .collect().head
      assert(sig.getSeq[Long](0).length == 128)
      assert(ext.catalog.functionExists("graft_minhash"))
      assert(ext.catalog.functionExists("graft_simhash"))
    } finally {
      ext.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      // restore a session with the standard test config for any
      // suite that runs after this one
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
  }
}
