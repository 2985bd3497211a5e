package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextSim
import graft.ops.Dedup

/** Candidate-volume probe for the PPJoin mid-prefix A/B (round 14):
  * counts raw equi-join collisions, grouped pairs, and post-positional
  * candidates for the symmetric (round-13) and asymmetric (mid-prefix)
  * forms at a given SF dir + threshold. Temporary diagnostic main.
  */
object ProfilePP {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfx10")
    val thrNum = args.headOption.map(_.toInt).getOrElse(6)
    val thrDen = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sh = TextSim.shingles(T.documents(spark, d), 3)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val shg = Dedup.gramIds(sh).localCheckpoint(true)
    val szs = sizes.localCheckpoint(true)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("gid"))
    val ranked = shg.withColumn("rk", row_number().over(wDoc).cast("long"))
      .join(szs, "doc_id").localCheckpoint(true)

    def probePref = ranked.filter(col("rk") <=
      col("sz") - expr(s"($thrNum * sz + ${thrDen - 1}) div $thrDen") + 1)
    def midPref = ranked.filter(col("rk") <=
      col("sz") - expr(s"(${2 * thrNum} * sz + ${thrNum + thrDen - 1}) " +
        s"div ${thrNum + thrDen}") + 1)

    println(s"PP rows: full=${ranked.count()} probe=${probePref.count()} mid=${midPref.count()}")

    // symmetric (round-13) form
    val pA = probePref.select(col("doc_id").as("id1"), col("gid"),
      col("sz").as("n1"), col("rk").as("rk1"))
    val pB = probePref.select(col("doc_id").as("id2"), col("gid"),
      col("sz").as("n2"), col("rk").as("rk2"))
    val symRaw = pA.join(pB, Seq("gid"))
      .filter(col("id1") < col("id2") &&
        least(col("n1"), col("n2")) * thrDen >=
          greatest(col("n1"), col("n2")) * thrNum)
    val symGrouped = symRaw.groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("k"),
        max(col("rk1")).as("ra"), max(col("rk2")).as("rb"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2"))
    val symKept = symGrouped.filter(col("k") +
      least(col("n1") - col("ra"), col("n2") - col("rb")) >=
      expr(s"($thrNum * (n1 + n2) + ${thrNum + thrDen - 1}) div ${thrNum + thrDen}"))
    println(s"PP sym: raw=${symRaw.count()} pairs=${symGrouped.count()} kept=${symKept.count()}")

    // asymmetric (mid-prefix) form
    val pr = probePref.select(col("doc_id").as("idp"), col("gid"),
      col("sz").as("np"), col("rk").as("rkp"))
    val ix = midPref.select(col("doc_id").as("idi"), col("gid"),
      col("sz").as("ni"), col("rk").as("rki"))
    val asymRaw = pr.join(ix, Seq("gid"))
      .filter((col("ni") < col("np") ||
          (col("ni") === col("np") && col("idi") < col("idp"))) &&
        col("ni") * thrDen >= col("np") * thrNum)
    val asymGrouped = asymRaw.groupBy(col("idp"), col("idi"))
      .agg(count(lit(1)).as("k"),
        max(col("rkp")).as("ra"), max(col("rki")).as("rb"),
        first(col("np")).as("np"), first(col("ni")).as("ni"))
    val asymKept = asymGrouped.filter(col("k") +
      least(col("np") - col("ra"), col("ni") - col("rb")) >=
      expr(s"($thrNum * (np + ni) + ${thrNum + thrDen - 1}) div ${thrNum + thrDen}"))
    println(s"PP asym: raw=${asymRaw.count()} pairs=${asymGrouped.count()} kept=${asymKept.count()}")

    // hybrid: symmetric join + strong positional bound + the
    // mid-prefix EXISTENCE filter (the first common gram of a true
    // pair sits in P(larger) ∩ I(smaller), and I ⊆ P, so among the
    // symmetric collisions of a true pair at least one has the
    // smaller side's rank inside its mid-prefix)
    val li = s"(${2 * thrNum} * %s + ${thrNum + thrDen - 1}) div ${thrNum + thrDen}"
    val hybGrouped = symRaw
      .withColumn("in_mid",
        when(col("n1") <= col("n2"),
          (col("rk1") <= col("n1") - expr(li.format("n1")) + 1).cast("int"))
        .otherwise(
          (col("rk2") <= col("n2") - expr(li.format("n2")) + 1).cast("int")))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("k"),
        max(col("rk1")).as("ra"), max(col("rk2")).as("rb"),
        first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        max(col("in_mid")).as("has_mid"))
    val hybKept = hybGrouped.filter(col("has_mid") === 1 && col("k") +
      least(col("n1") - col("ra"), col("n2") - col("rb")) >=
      expr(s"($thrNum * (n1 + n2) + ${thrNum + thrDen - 1}) div ${thrNum + thrDen}"))
    println(s"PP hyb: kept=${hybKept.count()}")
    spark.stop()
  }
}
