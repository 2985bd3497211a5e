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
