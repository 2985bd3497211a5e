package graft
import org.apache.spark.sql.SparkSession
object One {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count()
    for (q <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      // noop write = full-column computation, same as Bench
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(s"TIMING $q run$i ${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
