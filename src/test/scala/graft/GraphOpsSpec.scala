package graft

import graft.ops.{CorpusOps, GraphOps}
import org.apache.spark.sql.functions._

/** Fixed-point PageRank (q163) and the Gini concentration report
  * (q162): both are exact-integer operators, so their specs are
  * hand-computable closed cases plus partition-count invariance (the
  * determinism claim that justifies oracle-checking them at all).
  */
class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  test("2-cycle is stationary at 1.0; star graph matches hand arithmetic") {
    // u↔v, deg 1 each: r' = 150000 + 850·1e6/1000 = 1e6 — exact fixpoint.
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("u", "v")
    val rc = GraphOps.integerPagerank(cyc, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rc === Map(1L -> 1000000L, 2L -> 1000000L))

    // Star: center 0 — leaves 1,2,3 (undirected). After one step:
    //   r(center) = 150000 + 850·(3·1e6) div 1000          = 2 700 000
    //   r(leaf)   = 150000 + 850·(1e6 div 3) div 1000      =   433 333
    // (1e6 div 3 = 333333; 850·333333 = 283333050; div 1000 = 283333)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("u", "v")
    val r1 = GraphOps.integerPagerank(star, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(0L -> 2700000L, 1L -> 433333L, 2L -> 433333L, 3L -> 433333L))
  }

  test("pagerank is bit-identical across shuffle-partition counts") {
    val edges = (0L until 300L).flatMap { i =>
      val a = i; val b = (i * 7 + 3) % 300
      Seq((a, b), (b, a))
    }.toDF("u", "v").distinct()
    def run() = GraphOps.integerPagerank(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      assert(run() === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(base.values.forall(r => r >= 150000L), "teleport mass is a floor")
  }

  test("shortest paths relax exactly k hops and keep the cheaper route") {
    // 1 →(5) 2 →(1) 3 and the direct 1 →(10) 3: the two-hop route
    // (cost 6) must beat the one-hop (10) once hops ≥ 2; node 4 is
    // reachable only at hop 3; node 5 is disconnected.
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L), (3L, 4L, 2L),
      (5L, 6L, 1L)).toDF("u", "v", "w")
    val seeds = Seq((1L, 0L)).toDF("node", "d")
    def run(h: Int) = GraphOps.shortestPaths(edges, seeds, h).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === Map(1L -> 0L, 2L -> 5L, 3L -> 10L))
    assert(run(2) === Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 12L))
    assert(run(3) === Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 8L))
    assert(!run(4).contains(5L) && !run(4).contains(6L), "disconnected stays absent")
  }

  test("gini: uniform source scores 0, winner-take-all scores (n-1)/n") {
    val uniform = (0L until 40L).map(i => ("u", i, 500L))
    val skewed = ("w", 100L, 10000L) +: (101L until 140L).map(i => ("w", i, 0L))
    val docs = (uniform ++ skewed).toDF("source", "doc_id", "n_chars")
    val got = CorpusOps.giniReport(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got("u")._1 === 0L)
    // n = 40: G = 39/40 = 0.975 → 975000 ppm; top decile holds all chars
    assert(got("w") === ((975000L, 10000L)))
  }

  test("triangles: K4 counts each node in 3 triangles at lcc 10000; paths score 0") {
    // K4 ∪ path 10-11-12 ∪ a triangle with a pendant (20-21-22, 22-23).
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val path = Seq((10L, 11L), (11L, 12L))
    val tripend = Seq((20L, 21L), (20L, 22L), (21L, 22L), (22L, 23L))
    val edges = (k4 ++ path ++ tripend).toDF("a", "b")
    val got = GraphOps.triangleStats(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // K4: deg 3, C(3,2)=3 neighbor pairs all connected → tri 3, lcc 1.
    (1L to 4L).foreach(n => assert(got(n) === ((3L, 3L, 10000L)), s"node $n"))
    // Path interior: deg 2, no closing edge → tri 0, lcc 0.
    assert(got(11L) === ((2L, 0L, 0L)))
    assert(got(10L) === ((1L, 0L, 0L)))
    // Pendant triangle: 22 has deg 3 but only 1 of its 3 neighbor
    // pairs closes → lcc = 2·1·10000 div (3·2) = 3333.
    assert(got(22L) === ((3L, 1L, 3333L)))
    assert(got(23L) === ((1L, 0L, 0L)))
    assert(got(20L) === ((2L, 1L, 10000L)))
  }

  test("sampled triangle tier: subgraph of the exact tier, estimator algebra holds") {
    val sf = sf001
    val exact = graft.ops.GraphOps.queries("q185_triangles")(spark, sf)
    val sampled = graft.ops.GraphOps.queries("q185b_triangles_sampled")(spark, sf)
      .collect()(0)
    val exactTri = exact.agg(expr("CAST(sum(tri) div 3 AS BIGINT)")).collect()(0).getLong(0)
    val exactNodes = exact.count()
    // The md5 coin keeps ~1/4 of edges: the sampled node set is a
    // subset and the sampled exact count cannot exceed the full count.
    assert(sampled.getAs[Long]("n_nodes") <= exactNodes)
    assert(sampled.getAs[Long]("n_tri_sampled") <= exactTri)
    // est = 64 × sampled count, by construction (1/p³ at p=1/4).
    assert(sampled.getAs[Long]("est_tri") === sampled.getAs[Long]("n_tri_sampled") * 64)
  }

  test("sampled triangle tier is deterministic across shuffle-partition counts") {
    val a = graft.ops.GraphOps.queries("q185b_triangles_sampled")(spark, sf001).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = graft.ops.GraphOps.queries("q185b_triangles_sampled")(spark, sf001).collect().toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("k-core peeling: K4 survives 3-core peeling, chains and pendants strip; dense graphs are fixed points") {
    // K4 (every deg 3) ∪ a chain 10-11-12-13 hanging off node 1 via
    // (1,10): the chain peels in waves — deg-1 endpoints go first —
    // and K4 survives with its internal degrees intact.
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((1L, 10L), (10L, 11L), (11L, 12L), (12L, 13L))
    val got = GraphOps.kcorePeel((k4 ++ chain).toDF("a", "b"), 3, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core of K4+chain must be exactly K4, got $got")
    // Idempotence: peeling the surviving core again changes nothing.
    val again = GraphOps.kcorePeel(k4.toDF("a", "b"), 3, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
    // k above the max degree empties the graph.
    assert(GraphOps.kcorePeel(k4.toDF("a", "b"), 4, 3).count() === 0L)
  }

  test("triangles are orientation-invariant: hub graph counts once per closing edge") {
    // Hub 0 connected to 1..30; extra edges (1,2) and (3,4) → exactly
    // 2 triangles; hub participates in both. Degree ordering must not
    // double- or zero-count regardless of which endpoint is the apex.
    val hub = (1L to 30L).map(i => (0L, i))
    val extra = Seq((1L, 2L), (3L, 4L))
    val edges = (hub ++ extra).toDF("a", "b")
    val got = GraphOps.triangleStats(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) === 2L)
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L && got(4L) === 1L)
    assert(got(5L) === 0L)
    assert(got.values.sum === 6L, "each triangle counted exactly 3 node-times")
  }

  test("link prediction: path and cycle closed forms, existing edges excluded (q193)") {
    // Path 1—3—2: the only candidate is (1,2) through center 3
    // (deg 2) → cn=1, ra_ppm = 1000000 div 2 = 500000.
    val path = Seq((1L, 3L), (2L, 3L)).toDF("a", "b")
    val p = GraphOps.linkPredictionRA(path, cap = 32, topK = 10).collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((1L, 2L, 1L, 500000L)))

    // 4-cycle 1-2-3-4: both diagonals score through two deg-2 centers
    // → cn=2, ra_ppm=1000000; adjacent pairs are edges and excluded.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val c = GraphOps.linkPredictionRA(cyc, cap = 32, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(c === Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("link prediction: fan-out cap bounds candidate volume deterministically (q193)") {
    // Star center 0 with 5 leaves, all leaf pairs non-adjacent. With
    // cap=5 every leaf pair is a candidate (C(5,2)=10, each cn=1,
    // ra_ppm = 1000000 div 5); with cap=2 the center keeps exactly 2
    // md5-chosen neighbors → exactly 1 candidate pair. Which leaves
    // survive is the coin's choice; HOW MANY is the cap's contract.
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val full = GraphOps.linkPredictionRA(star, cap = 5, topK = 100).collect()
    assert(full.length === 10)
    assert(full.forall(r => r.getLong(2) === 1L && r.getLong(3) === 200000L))
    val capped = GraphOps.linkPredictionRA(star, cap = 2, topK = 100).collect()
    assert(capped.length === 1)
    // Determinism: the same coin picks the same pair on a rerun.
    val again = GraphOps.linkPredictionRA(star, cap = 2, topK = 100).collect()
    assert(capped.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("label propagation: disjoint cliques converge to their min id; star oscillation is pinned (q199)") {
    // Two disjoint triangles: after round 1 every node carries the min
    // OTHER member's id; rounds 2-3 settle on the clique minimum.
    val tris = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                   (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val got = GraphOps.labelPropagation(tris, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       10L -> 10L, 11L -> 10L, 12L -> 10L))

    // Star 0–{1..4} is bipartite, so strict synchronous LPA oscillates
    // (center and leaves swap labels each round). The bounded-round
    // operator's value after exactly 3 rounds is a pinned closed form:
    // r1: center→1 (tie min of leaf ids), leaves→0; r2: center→0,
    // leaves→1; r3: center→1, leaves→0.
    val star = (1L to 4L).map(i => (0L, i)).toDF("a", "b")
    val s3 = GraphOps.labelPropagation(star, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s3 === Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("modularity: driver recompute from q199's own labels, bounds hold (q248)") {
    val r = GraphOps.queries("q248_modularity")(spark, sf001).collect().head
    val labels = GraphOps.queries("q199_label_propagation")(spark, sf001).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val ops = graft.T.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = ops.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val m = edges.size.toLong
    val comms = labels.values.toSet
    val ec = comms.map(c => c ->
      edges.count(e => labels(e._1) == c && labels(e._2) == c).toLong).toMap
    val dc = comms.map(c => c ->
      edges.toSeq.flatMap(e => Seq(e._1, e._2)).count(labels(_) == c).toLong).toMap
    val num = comms.toSeq.map(c => 4 * m * ec(c) - dc(c) * dc(c)).sum
    assert(r.getLong(0) === comms.size.toLong)
    assert(r.getLong(1) === m)
    assert(r.getLong(2) === 1000000L * num / (4 * m * m))
    // Q ∈ [-0.5, 1]
    assert(r.getLong(2) >= -500000L && r.getLong(2) <= 1000000L)
  }

  test("degree assortativity: driver-side Pearson over endpoint degrees matches (q234)") {
    val r = GraphOps.queries("q234_assortativity")(spark, sf001).collect().head
    val ops = graft.T.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = ops.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val dir = edges.toSeq.flatMap(e => Seq(e, e.swap))
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    assert(r.getLong(0) === deg.size.toLong)
    assert(r.getLong(1) === edges.size.toLong)
    assert(r.getLong(2) === dir.size.toLong)
    val xs = dir.map(e => deg(e._1)); val ys = dir.map(e => deg(e._2))
    val n = xs.size.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
    val sy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
    val want = cov / (sx * sy)
    assert(math.abs(r.getDouble(3) - want) < 1e-3,
      s"assortativity got ${r.getDouble(3)} want $want")
    // degree-correlation is symmetric by construction: |r| ≤ 1
    assert(math.abs(r.getDouble(3)) <= 1.0001)
  }
}
