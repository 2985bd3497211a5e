package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Components, TextSim}
import graft.ops.Dedup

/** Phase profiler for q213_incremental_components (r13 verdict item 2):
  * times each sub-plan of the incremental-canonicalization pipeline in
  * isolation so the 11.3 s isolated cost can be attributed to
  * delta-minhash / band probe / verify / quotient contraction /
  * components supersteps — and A/Bs the one structural suspect found by
  * reading the plan: oldLab (canonicalizeLsh) has FOUR downstream
  * consumers and deltaPairs THREE, so their un-checkpointed subtrees
  * (exactReps windows, the 128-hash minhash, the verify join) recompute
  * per consumer. `fullck` is q213 with those two relations eagerly
  * localCheckpointed once each.
  *
  * Run one phase per JVM (tools/profile_q213.sh) — same fresh-JVM
  * discipline as graft.One. Prints `PHASE <name> <sec>` (min of 2).
  */
object ProfileQ213 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count()
    val s = spark

    // q213's building blocks, verbatim from ops/Dedup.scala:548-592.
    val docs = T.documents(s, d)
    val cutDf = docs.agg(expr("(4 * max(doc_id)) div 5").as("cut"))
    def oldDocs = docs.crossJoin(broadcast(cutDf))
      .filter(col("doc_id") <= col("cut")).drop("cut")
    def bands = TextSim.lshBands(TextSim.minhashSignatureNative(docs, 128, 3), 32, 4)
    def deltaBands = bands.crossJoin(broadcast(cutDf))
      .filter(col("doc_id") > col("cut")).drop("cut")
    def cand = bands.as("l")
      .join(deltaBands.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"))
      .distinct()
    def shAll = TextSim.shingles(docs, 3)
    def deltaPairs = TextSim.verifyJaccard(cand, shAll, 0.8)
      .select(col("id1"), col("id2"))

    def q213From(oldLab: DataFrame, dp: DataFrame): DataFrame = {
      val l1 = oldLab.select(col("doc_id").as("id1"), col("canonical_id").as("c1"))
      val l2 = oldLab.select(col("doc_id").as("id2"), col("canonical_id").as("c2"))
      val contracted = dp
        .join(l1, Seq("id1"), "left_outer")
        .join(l2, Seq("id2"), "left_outer")
        .select(coalesce(col("c1"), col("id1")).as("id1"),
                coalesce(col("c2"), col("id2")).as("id2"))
        .filter(col("id1") =!= col("id2"))
      val compM = Components.connectedComponents(contracted)
        .select(col("doc_id").as("node"), col("canonical_id").as("cf"))
      val parts = oldLab.select(col("doc_id"))
        .unionByName(dp.select(col("id1").as("doc_id")))
        .unionByName(dp.select(col("id2").as("doc_id")))
        .distinct()
      val withL0 = parts
        .join(oldLab.withColumnRenamed("canonical_id", "l0"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("l0"), col("doc_id")).as("l0"))
      withL0.join(compM, withL0("l0") === compM("node"), "left_outer")
        .select(col("doc_id"), coalesce(col("cf"), col("l0")).as("canonical_id"))
        .orderBy(col("doc_id"))
    }

    val phases: Map[String, () => DataFrame] = Map(
      // exact-dup collapse over the old 80% (windowed md5 grouping)
      "exact" -> (() => Dedup.exactReps(oldDocs, 3)),
      // old-corpus LSH: minhash+bands+probe+verify over representatives
      "oldpairs" -> (() => {
        val withRep = Dedup.exactReps(oldDocs, 3)
        val reps = withRep.filter(col("doc_id") === col("rep_id"))
          .select(col("doc_id"), col("text"))
        TextSim.verifyJaccard(
          TextSim.bandCandidates(
            TextSim.lshBands(TextSim.minhashSignatureNative(reps, 128, 3), 32, 4)),
          TextSim.shingles(reps, 3), 0.8)
      }),
      // full old-state build incl. its internal components run
      "oldlab" -> (() => Dedup.canonicalizeLsh(oldDocs)),
      // 128-hash minhash + banding over the FULL corpus
      "bands" -> (() => bands),
      // delta band probe + distinct
      "cand" -> (() => cand),
      // exact verify of delta candidates
      "deltapairs" -> (() => deltaPairs),
      // the shipped query, verbatim
      "full" -> (() => SparkEntry.queries("q213_incremental_components")(s, d)),
      // A/B: same plan, oldLab + deltaPairs checkpointed once each
      "fullck" -> (() => {
        val ol = Dedup.canonicalizeLsh(oldDocs).localCheckpoint(true)
        val dp = deltaPairs.localCheckpoint(true)
        q213From(ol, dp)
      }),
    )
    for (p <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      phases(p)().write.format("noop").mode("overwrite").save()
      println(s"PHASE $p run$i ${(System.nanoTime() - t0) / 1e9}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
