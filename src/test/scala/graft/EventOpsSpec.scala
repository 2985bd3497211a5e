package graft

import graft.ops.EventOps
import java.sql.Timestamp

/** Ordered-funnel semantics the SQL oracle can't distinguish from the
  * naive global-min formulation on arbitrary data: stage times must be
  * conditional on the previous stage, so out-of-order events never
  * advance the funnel.
  */
class EventOpsSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private def funnel(rows: (Long, String, Timestamp)*): (Long, Long, Long) = {
    import spark.implicits._
    val r = EventOps.orderedFunnel(rows.toDF("user_id", "event_type", "ts"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("click strictly after signup advances the funnel") {
    assert(funnel(
      (1L, "signup", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(10))
    ) === ((1L, 1L, 1L)))
  }

  test("click before signup does not advance the funnel") {
    // A user whose only click precedes signup never reaches the click
    // stage, regardless of later purchases.
    assert(funnel(
      (1L, "click", ts(0)), (1L, "signup", ts(5)), (1L, "purchase", ts(10))
    ) === ((1L, 0L, 0L)))
  }

  test("pre-signup click plus post-signup click counts via the later click") {
    // Global-min-click would pick ts(0) <= t_signup and drop the user.
    assert(funnel(
      (1L, "click", ts(0)), (1L, "signup", ts(2)),
      (1L, "click", ts(6)), (1L, "purchase", ts(9))
    ) === ((1L, 1L, 1L)))
  }

  test("purchase between signup and click does not complete the funnel") {
    assert(funnel(
      (1L, "signup", ts(0)), (1L, "purchase", ts(3)), (1L, "click", ts(6))
    ) === ((1L, 1L, 0L)))
  }

  test("simultaneous click and signup is not 'after' (strict ordering)") {
    assert(funnel(
      (1L, "signup", ts(0)), (1L, "click", ts(0)), (1L, "purchase", ts(5))
    ) === ((1L, 0L, 0L)))
  }

  test("users aggregate independently") {
    assert(funnel(
      (1L, "signup", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "signup", ts(0)), (2L, "click", ts(1)),
      (3L, "view", ts(0))
    ) === ((2L, 2L, 1L)))
  }

  test("pii scrub audit counts every pattern and collapses payload diversity (q111)") {
    import spark.implicits._
    // Staged as the raw parquet shape T.events expects: ts as raw nanos
    // (the driver tables are TIMESTAMP(NANOS) read via nanosAsLong).
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    Seq(
      // digit-run counts are over the ORIGINAL payload, so the IP's
      // four octets count as digit runs too (documented semantics).
      (1L, 1000000000L, 1L, "a", 0.0, """{"email": "a.b@ex.com", "n": 42}"""),
      (2L, 2000000000L, 1L, "a", 0.0, """{"ip": "10.0.0.1"}"""),
      (3L, 3000000000L, 2L, "a", 0.0, """{"k": 87}"""),
      (4L, 4000000000L, 2L, "a", 0.0, """{"k": 12}"""),
      (5L, 5000000000L, 3L, "a", 0.0, """{"clean": true}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.queries("q111_pii_scrub_audit")(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    // n_events=5; digit runs: 42 | 10,0,0,1 | 87 | 12 -> 7; one email;
    // one IP; 4 events touched; scrubbed payloads: email-doc, ip-doc,
    // {"k": <NUM>} (x2 collapsed), clean -> 4 distinct.
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
            row.getLong(5), row.getLong(6)) === ((5L, 7L, 1L, 1L, 4L, 4L)),
      s"audit miscounted: ${row.mkString(",")}")
  }

  test("resampleInterpolate fills interior gaps linearly, truncates fractions, leaves spans dense (q149)") {
    import spark.implicits._
    // user 1: days 0,3 observed at 100→400: gap days 1,2 must read 200,300.
    // user 2: days 5,8 at 10→20: step 10/3 — integer-truncated 13,16.
    // user 3: single day — no gaps, passes through.
    val daily = Seq(
      (1L, 0L, 100L), (1L, 3L, 400L),
      (2L, 5L, 10L), (2L, 8L, 20L),
      (3L, 2L, 7L)
    ).toDF("user_id", "day", "v")
    val out = EventOps.resampleInterpolate(daily)
      .orderBy("user_id", "day")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 100L, "obs"), (1L, 1L, 200L, "interp"), (1L, 2L, 300L, "interp"), (1L, 3L, 400L, "obs"),
      (2L, 5L, 10L, "obs"), (2L, 6L, 13L, "interp"), (2L, 7L, 16L, "interp"), (2L, 8L, 20L, "obs"),
      (3L, 2L, 7L, "obs")))
    // The q149 catalog feed keeps v non-negative (events.value >= 0),
    // the precondition for DIV ≡ floor-div cross-engine.
    val ev = graft.T.events(spark, sf001)
    assert(ev.filter($"value" < 0).isEmpty)
  }

  test("transitions pair consecutive events per user only, with exact outflow permille (q153)") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 path: a→b→a→c; user 2 path: a→b. No cross-user pairs:
    // user 2's first event is later than user 1's last.
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "a"),
      (2L, t("2024-01-01 00:01:00"), 1L, "b"),
      (3L, t("2024-01-01 00:02:00"), 1L, "a"),
      (4L, t("2024-01-01 00:03:00"), 1L, "c"),
      (5L, t("2024-01-02 00:00:00"), 2L, "a"),
      (6L, t("2024-01-02 00:01:00"), 2L, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.transitions(ev).orderBy("from_type", "to_type")
      .as[(String, String, Long, Long)].collect().toSeq
    // from a: a→b twice (both users), a→c once → 666 / 333 permille.
    assert(out == Seq(("a", "b", 2L, 666L), ("a", "c", 1L, 333L), ("b", "a", 1L, 1000L)))
  }

  test("pathPattern matches ADJACENT pairs only, in timestamp order, per user (q156)") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: click,view,purchase — click→purchase NOT adjacent → no row
      (1L, t("2024-01-01 00:00:00"), 1L, "click"),
      (2L, t("2024-01-01 00:01:00"), 1L, "view"),
      (3L, t("2024-01-01 00:02:00"), 1L, "purchase"),
      // user 2: view,click,purchase,click,purchase — 2 adjacent matches;
      // events arrive OUT OF ORDER to prove the sort inside the agg
      (7L, t("2024-01-02 00:04:00"), 2L, "purchase"),
      (4L, t("2024-01-02 00:00:00"), 2L, "view"),
      (6L, t("2024-01-02 00:03:00"), 2L, "click"),
      (5L, t("2024-01-02 00:01:00"), 2L, "click"),
      (8L, t("2024-01-02 00:02:00"), 2L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.pathPattern(ev, "click,purchase")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 5L, 2L)),
      "only user 2, with exactly 2 adjacent click→purchase pairs")
  }

  test("cohort retention attributes each user to its first-seen week (q132)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    val day = 86400L
    val epoch2024 = 1704067200L // 2024-01-01 UTC, the corpus epoch
    def ns(daysAfter: Long) = (epoch2024 + daysAfter * day + 3600L) * 1000000000L
    Seq(
      (1L, ns(1), 10L, "a", 0.0, "{}"),   // user 10, week 0 (cohort)
      (2L, ns(15), 10L, "a", 0.0, "{}"),  // user 10, week 2
      (3L, ns(16), 10L, "a", 0.0, "{}"),  // same week 2 — one activity
      (4L, ns(8), 20L, "a", 0.0, "{}")    // user 20, week 1 (cohort)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.queries("q132_cohort_retention")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L),
      s"matrix mismatch: $got")
    // corpus-scale invariant: the offset-0 diagonal counts every user
    // exactly once (everyone is active in their own cohort week)
    val rows = EventOps.queries("q132_cohort_retention")(spark, sf001).collect()
    val diag = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val nUsers = T.events(spark, sf001).select("user_id").distinct().count()
    assert(diag === nUsers, "offset-0 cells must partition the user base")
  }

  test("funnel-by-cohort segments the ordered funnel per first-seen week (q133)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    val day = 86400L
    val epoch2024 = 1704067200L
    def ns(daysAfter: Long, hour: Long = 1L) =
      (epoch2024 + daysAfter * day + hour * 3600L) * 1000000000L
    Seq(
      // cohort 0: user 1 completes the whole funnel in order; user 2
      // only signs up.
      (1L, ns(1, 1), 1L, "signup", 0.0, "{}"),
      (2L, ns(1, 2), 1L, "click", 0.0, "{}"),
      (3L, ns(1, 3), 1L, "purchase", 0.0, "{}"),
      (4L, ns(2, 1), 2L, "signup", 0.0, "{}"),
      // cohort 1: user 3 signs up and clicks, but its purchase came
      // BEFORE the click — ordered semantics must not count it.
      (5L, ns(8, 1), 3L, "signup", 0.0, "{}"),
      (6L, ns(8, 3), 3L, "click", 0.0, "{}"),
      (7L, ns(8, 2), 3L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.queries("q133_funnel_by_cohort")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(0L) === ((2L, 1L, 1L, 500L, 1000L)),
      "cohort 0: 2 signups, 1 converted to click (500pm), that one purchased (1000pm)")
    assert(got(1L) === ((1L, 1L, 0L, 1000L, 0L)),
      "cohort 1: the pre-click purchase must not count as a conversion")
    // reconciliation at sf0.001: cohort cells must sum to q85's
    // global funnel counts
    val cells = EventOps.queries("q133_funnel_by_cohort")(spark, sf001).collect()
    val global = EventOps.queries("q85_event_funnel")(spark, sf001).collect().head
    assert(cells.map(_.getLong(1)).sum === global.getLong(0))
    assert(cells.map(_.getLong(2)).sum === global.getLong(1))
    assert(cells.map(_.getLong(3)).sum === global.getLong(2))
  }

  test("rolling actives: contiguous spine, WAU ≥ DAU, window equals brute-force recount (q194)") {
    val rows = EventOps.queries("q194_rolling_actives")(spark, sf001).collect()
    val days = rows.map(_.getLong(0))
    // calendar spine is contiguous min..max even if some day had no events
    assert(days.toSeq === (days.min to days.max).toSeq)
    rows.foreach { r =>
      val (dau, wau, st) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(wau >= dau, s"day ${r.getLong(0)}: wau $wau < dau $dau")
      assert(st >= 0L && st <= 1000000L)
      if (wau > 0) assert(st === 1000000L * dau / wau) else assert(st === 0L)
    }
    // brute-force recount of one interior window end straight off the table
    val mid = days.min + 10
    val expect = graft.T.events(spark, sf001)
      .selectExpr("user_id",
        "CAST(datediff(to_date(ts), date'2024-01-01') AS BIGINT) AS day")
      .where(s"day BETWEEN ${mid - 6} AND $mid")
      .select("user_id").distinct().count()
    assert(rows.find(_.getLong(0) == mid).get.getLong(2) === expect)
  }

  test("engagement histogram: user totals conserve, cumulative runs heaviest-first (q195)") {
    val rows = EventOps.queries("q195_engagement_histogram")(spark, sf001).collect()
    val totalUsers = graft.T.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === totalUsers)
    // cum_users accumulates from the HIGHEST n_active_days bucket down,
    // so in ascending output order it is non-increasing and the first
    // row (lowest bucket) carries the full population.
    val cums = rows.map(_.getLong(2))
    assert(cums.head === totalUsers)
    assert(cums.zip(cums.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getLong(3) === 1000000L)
  }

  test("inter-event gaps: ordered quantiles, gap count conserves N − U (q200)") {
    val rows = EventOps.queries("q200_interevent_gaps")(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "p50 must not exceed p90")
      assert(r.getDouble(3) <= r.getLong(4).toDouble, "p90 must not exceed max")
    }
    // every user's k events yield k−1 gaps, so gaps sum to N − U
    val ev = graft.T.events(spark, sf001)
    val n = ev.count()
    val u = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === n - u)
  }

  test("Mann–Kendall: pair counts are C(days,2) per type, S = up − down (q201)") {
    val rows = EventOps.queries("q201_trend_mk")(spark, sf001).collect()
    val daysPerType = graft.T.events(spark, sf001)
      .selectExpr("event_type", "to_date(ts) AS day").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      val d = daysPerType(t)
      assert(r.getLong(1) === d * (d - 1) / 2, s"$t pair count")
      assert(r.getLong(2) === r.getLong(3) - r.getLong(4), s"$t S = up − down")
      assert(math.abs(r.getLong(2)) <= r.getLong(1))
      val trend = r.getString(5)
      assert(trend === (if (r.getLong(2) > 0) "up" else if (r.getLong(2) < 0) "down" else "flat"))
    }
  }

  test("time-to-convert: ordered quantiles over exactly the full-funnel population (q204)") {
    val r = EventOps.queries("q204_time_to_convert")(spark, sf001).collect().head
    assert(r.getLong(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3) &&
      r.getDouble(3) <= r.getLong(4).toDouble, "min ≤ p50 ≤ p90 ≤ max")
    assert(r.getLong(1) > 0L, "stage ordering makes every delta strictly positive")
    // population = q85's full-funnel converters exactly
    val funnel = EventOps.queries("q85_event_funnel")(spark, sf001).collect().head
    assert(r.getLong(0) === funnel.getLong(2))
  }

  test("session bounce: session population equals q74's, bounces bounded, rates exact (q205)") {
    val rows = EventOps.queries("q205_session_bounce")(spark, sf001).collect()
    val q74Sessions = EventOps.queries("q74_sessionize")(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum === q74Sessions,
      "every session appears in exactly one entry-type bucket")
    rows.foreach { r =>
      val (n, b) = (r.getLong(1), r.getLong(2))
      assert(b <= n)
      assert(r.getLong(3) === 1000000L * b / n)
      assert(r.getLong(4) >= 0L)
      assert(r.getLong(5) <= 1000000L)
    }
  }

  test("new vs returning: day-0 all new, each user new exactly once, splits sum to DAU (q206)") {
    val rows = EventOps.queries("q206_new_vs_returning")(spark, sf001).collect()
    assert(rows.head.getLong(2) === 0L, "earliest day has no returning users")
    val totalUsers = graft.T.events(spark, sf001).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === totalUsers,
      "every user is new on exactly one day")
    // per-day split sums to that day's DAU from q194
    val dau = EventOps.queries("q194_rolling_actives")(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === dau(r.getLong(0)))
    }
  }

  test("dow profile: weekday cells conserve each type's days and events, means exact (q209)") {
    val rows = EventOps.queries("q209_dow_profile")(spark, sf001).collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 6))
    val byType = rows.groupBy(_.getString(0))
    val daily = graft.T.events(spark, sf001)
      .selectExpr("event_type", "to_date(ts) AS day").groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("day").as("nd"),
           org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getLong(2)).sum === daily(t)._1, s"$t day conservation")
      assert(rs.map(_.getLong(3)).sum === daily(t)._2, s"$t event conservation")
      rs.foreach(r => assert(r.getLong(4) === 100L * r.getLong(3) / r.getLong(2)))
    }
  }

  test("timeout funnel: 72h conversions nest inside q85's funnel population (q217)") {
    val r = EventOps.queries("q217_conversion_window")(spark, sf001).collect().head
    val (su, any, h72) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(h72 <= any && any <= su)
    val funnel = EventOps.queries("q85_event_funnel")(spark, sf001).collect().head
    assert(su === funnel.getLong(0) && any === funnel.getLong(2))
    assert(r.getLong(3) === 1000000L * any / math.max(su, 1L))
    assert(r.getLong(4) === 1000000L * h72 / math.max(su, 1L))
  }

  test("cohort LTV: running totals monotone per cohort, total mass conserves (q218)") {
    val rows = EventOps.queries("q218_cohort_ltv")(spark, sf001).collect()
    assert(rows.forall(_.getLong(1) >= 0L), "offsets are never negative")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val cums = sorted.map(_.getLong(4))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      assert(cums.last === sorted.map(_.getLong(3)).sum,
        "cumulative ends at the cohort's total revenue")
    }
    val totalCents = graft.T.events(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("CAST(round(value * 100) AS BIGINT) AS c")
      .agg(org.apache.spark.sql.functions.sum("c")).collect().head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === totalCents)
  }

  test("decayed value: halving never exceeds raw, ranking is by decayed cents (q221)") {
    val rows = EventOps.queries("q221_decayed_value")(spark, sf001).collect()
    assert(rows.length <= 100)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "decay can only shrink value")
      assert(r.getLong(3) >= 0L && r.getLong(1) > 0L)
    }
    val dv = rows.map(_.getLong(3))
    assert(dv.zip(dv.tail).forall { case (a, b) => a >= b }, "descending by decayed value")
  }

  test("top paths: bounded prefixes, counts cover at most the user population (q222)") {
    val rows = EventOps.queries("q222_top_paths")(spark, sf001).collect()
    assert(rows.length <= 20)
    rows.foreach(r => assert(r.getString(0).split(",").length <= 5))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val users = graft.T.events(spark, sf001).select("user_id").distinct().count()
    assert(counts.sum <= users)
  }

  test("peak concurrency: brute-force recount at the reported instant matches (q223)") {
    val r = EventOps.queries("q223_peak_concurrency")(spark, sf001).collect().head
    val (peak, atEp, nSess) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val sess = EventOps.queries("q74_sessionize")(spark, sf001).count()
    assert(nSess === sess)
    assert(peak >= 1L && peak <= nSess)
    // recount concurrency at at_ep straight from the session intervals
    val intervals = graft.T.events(spark, sf001)
      .selectExpr("user_id", "event_id", "CAST(floor(unix_timestamp(ts)) AS BIGINT) AS ep")
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2)))
      .groupBy(_._1).values.flatMap { evs =>
        val sorted = evs.sortBy(e => (e._3, e._2))
        val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var (start, last) = (sorted.head._3, sorted.head._3)
        sorted.tail.foreach { e =>
          if (e._3 - last > 1800) { bounds += ((start, last)); start = e._3 }
          last = e._3
        }
        bounds += ((start, last)); bounds
      }
    val conc = intervals.count { case (t0, t1) => t0 <= atEp && atEp <= t1 }
    assert(conc.toLong === peak, s"recount at $atEp gives $conc, reported $peak")
  }

  test("forward as-of: one row per purchase, next click never precedes it, brackets q77 (q224)") {
    val fwd = EventOps.queries("q224_asof_forward")(spark, sf001).collect()
    val purchases = graft.T.events(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(fwd.length.toLong === purchases)
    val bwd = EventOps.queries("q77_asof_join")(spark, sf001).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    fwd.foreach { r =>
      val pts = r.getTimestamp(2)
      val nxt = Option(r.getTimestamp(3))
      nxt.foreach(t => assert(!t.before(pts), "next click cannot precede the purchase"))
      bwd(r.getLong(0)).foreach { lst =>
        assert(!lst.after(pts), "q77's last click cannot follow the purchase")
      }
    }
  }

  private def dailyCounts(): Map[String, Array[(Long, Long)]] =
    graft.T.events(spark, sf001)
      .selectExpr("event_type",
        "CAST(datediff(to_date(ts), date'2024-01-01') AS BIGINT) AS day")
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (et, xs) =>
        et -> xs.map(t => (t._2, t._3)).sortBy(_._1)
      }

  test("autocorrelation: driver-side Pearson recompute at lags 1 and 7 matches (q225)") {
    val rows = EventOps.queries("q225_autocorrelation")(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 7L)
      val a = r.getDouble(3)
      assert(a >= -1.0001 && a <= 1.0001)
    }
    for ((et, ds) <- dailyCounts(); lag <- Seq(1L, 7L)) {
      val m = ds.toMap
      val pairs = ds.flatMap { case (day, c) =>
        m.get(day + lag).map(c2 => (c.toDouble, c2.toDouble))
      }
      if (pairs.length >= 2) {
        val n = pairs.length.toDouble
        val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
        val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
        val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
        val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
        val want = cov / (sx * sy)
        val got = rows.find(r => r.getString(0) == et && r.getLong(1) == lag)
          .get.getDouble(3)
        assert(math.abs(got - want) < 1e-3, s"$et lag=$lag got $got want $want")
      }
    }
  }

  test("churn labels: leakage-free by construction — features only from days <= 20, repeat-buyer label from 21-27 (q251)") {
    val rows = EventOps.queries("q251_churn_labels")(spark, sf001).collect()
    val evs = graft.T.events(spark, sf001)
      .selectExpr("user_id", "CAST(datediff(to_date(ts), date'2024-01-01') AS BIGINT) AS day",
        "event_type", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = evs.groupBy(_._1)
    val obsUsers = byUser.filter(_._2.exists(_._2 <= 20)).keySet
    assert(rows.map(_.getLong(0)).toSet === obsUsers,
      "exactly the observation-window users get a row")
    rows.foreach { r =>
      val obs = byUser(r.getLong(0)).filter(_._2 <= 20)
      assert(r.getLong(1) === obs.length.toLong)
      assert(r.getLong(2) === obs.count(_._3 == "purchase").toLong)
      assert(r.getLong(3) === 20L - obs.map(_._2).max)
      assert(r.getLong(4) === obs.map(_._4).sum)
      val bought = byUser(r.getLong(0))
        .count(e => e._2 > 20 && e._2 <= 27 && e._3 == "purchase") >= 2
      assert(r.getLong(5) === (if (bought) 1L else 0L))
    }
    // both label classes must be populated or the set is degenerate
    assert(rows.exists(_.getLong(5) == 1L) && rows.exists(_.getLong(5) == 0L))
  }

  test("lag features: trailing window, recency and cumulative recomputed per user (q250)") {
    val rows = EventOps.queries("q250_lag_features")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
    val daily = rows.groupBy(_._1)
    assert(rows.nonEmpty)
    daily.foreach { case (_, ds) =>
      val sorted = ds.sortBy(_._2)
      var cum = 0L
      sorted.zipWithIndex.foreach { case ((_, day, nDay, prev7, since, cumGot), i) =>
        val want7 = sorted.filter(x => x._2 >= day - 7 && x._2 <= day - 1).map(_._3).sum
        assert(prev7 === want7, s"day $day trailing window")
        val wantSince = if (i == 0) None else Some(day - sorted(i - 1)._2)
        assert(since === wantSince)
        cum += nDay
        assert(cumGot === cum)
      }
    }
    // gaps exist in the data, so the RANGE frame must differ from a
    // naive ROWS 7 PRECEDING somewhere
    assert(rows.exists(r => r._5.exists(_ > 1)), "some user skips a day")
  }

  test("mann-whitney: midrank/tie algebra recomputed in driver, U symmetric (q246)") {
    val rows = EventOps.queries("q246_mann_whitney")(spark, sf001).collect()
    val evs = graft.T.events(spark, sf001)
      .selectExpr("event_type",
        "CAST(datediff(to_date(ts), date'2024-01-01') AS INT) < 15 AS is_a",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    rows.foreach { r =>
      val grp = evs.filter(_._1 == r.getString(0))
      val na = grp.count(_._2).toLong
      val nb = grp.length - na
      // midranks over the combined sorted sample
      val sorted = grp.sortBy(_._3)
      val midrank = sorted.map(_._3).zipWithIndex
        .groupBy(_._1).view.mapValues { xs =>
          val ranks = xs.map(_._2 + 1)
          ranks.sum.toDouble / ranks.length
        }.toMap
      val r1 = grp.filter(_._2).map(e => midrank(e._3)).sum
      val u1 = na.toDouble * nb + na * (na + 1) / 2.0 - r1
      assert(r.getLong(1) === na && r.getLong(2) === nb)
      assert(r.getLong(3).toDouble === 2 * u1, "twice-U1 integer image")
      // U1 + U2 = n_a * n_b (the rank-sum identity)
      val r2 = grp.filter(!_._2).map(e => midrank(e._3)).sum
      val u2 = nb.toDouble * na + nb * (nb + 1) / 2.0 - r2
      assert(math.abs(u1 + u2 - na.toDouble * nb) < 1e-6)
      val cnts = grp.groupBy(_._3).values.map(_.length.toLong)
      val tieT = cnts.map(c => c * c * c - c).sum
      val n = na + nb
      if (na > 0 && nb > 0 && n > 1 && (n + 1) * n * (n - 1) > tieT) {
        val z = (u1 - na.toDouble * nb / 2) /
          math.sqrt(na.toDouble * nb / 12 *
            ((n + 1).toDouble - tieT.toDouble / (n.toDouble * (n - 1))))
        assert(r.getLong(4) === math.floor(1000 * z).toLong, s"${r.getString(0)} z")
        assert(r.getLong(5) === (if (math.abs(r.getLong(4)) >= 1960) 1L else 0L))
      } else assert(r.isNullAt(4))
    }
  }

  test("metric waterfall: terms recomputed, decomposition adds up within the 3-cent floor bound (q252)") {
    val r = EventOps.queries("q252_metric_waterfall")(spark, sf001).collect().head
    val evs = graft.T.events(spark, sf001)
      .selectExpr("user_id",
        "CAST(datediff(to_date(ts), date'2024-01-01') AS INT) < 15 AS is_a",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .where("event_type = 'purchase'")
      .collect().map(x => (x.getLong(0), x.getBoolean(1), x.getLong(2)))
    def stats(a: Boolean) = {
      val g = evs.filter(_._2 == a)
      (g.map(_._1).distinct.length.toLong, g.length.toLong, g.map(_._3).sum)
    }
    val (u1, p1, r1) = stats(true)
    val (u2, p2, r2) = stats(false)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((u1, p1, r1)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((u2, p2, r2)))
    assert(r.getLong(6) === r2 - r1)
    assert(r.getLong(7) === (u2 - u1) * r1 / u1)
    assert(r.getLong(8) === (p2 * u1 - p1 * u2) * r1 / (u1 * p1))
    assert(r.getLong(9) === (r2 * p1 - r1 * p2) / p1)
    assert(r.getLong(10) === r.getLong(6) - r.getLong(7) - r.getLong(8) - r.getLong(9))
    // the three exact rationals telescope to delta exactly; flooring
    // each loses strictly less than 1 cent → |residual| < 3
    assert(math.abs(r.getLong(10)) <= 3L, s"residual ${r.getLong(10)}")
  }

  test("ppm waterfall: terms recomputed, ppm quantization cancels, 3-cent bound holds (q252b)") {
    val exact = EventOps.queries("q252_metric_waterfall")(spark, sf001).collect().head
    val r = EventOps.queries("q252b_waterfall_ppm")(spark, sf001).collect().head
    // identical period rollups
    (0 to 6).foreach(i => assert(r.getLong(i) === exact.getLong(i)))
    val (u1, p1, r1) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (u2, p2, r2) = (r.getLong(3), r.getLong(4), r.getLong(5))
    val ru = u2 * 1000000L / u1
    val rp = p2 * 1000000L / p1
    assert(r.getLong(7) === ru && r.getLong(8) === rp)
    assert(r.getLong(9) === (ru - 1000000L) * r1 / 1000000L)
    assert(r.getLong(10) === (rp - ru) * r1 / 1000000L)
    assert(r.getLong(11) === r2 - rp * r1 / 1000000L)
    assert(r.getLong(12) ===
      r.getLong(6) - r.getLong(9) - r.getLong(10) - r.getLong(11))
    // ru and rp cancel algebraically in the pre-floor sum (T1+T2+T3 =
    // r2−r1 for ANY quantized ru/rp), so the ppm quantization
    // contributes nothing — only the three final /1e6 floorings do:
    // the production tier keeps the exact tier's 3-cent bound
    assert(math.abs(r.getLong(12)) <= 3L, s"residual ${r.getLong(12)}")
    // and the ppm terms track the exact tier within its quantization
    // grain (1 ppm of r1 per ratio image, plus the flooring cents)
    val grain = r1 / 1000000L + 2L
    assert(math.abs(r.getLong(9) - exact.getLong(7)) <= 2L * grain)
    assert(math.abs(r.getLong(10) - exact.getLong(8)) <= 2L * grain)
    assert(math.abs(r.getLong(11) - exact.getLong(9)) <= 2L * grain)
  }

  test("capture-recapture: sample replay matches, estimator brackets sanity (q244)") {
    val rows = EventOps.queries("q244_capture_recapture")(spark, sf001).collect()
    def h8(sc: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sc.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val evs = graft.T.events(spark, sf001)
      .selectExpr("event_type", "user_id", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = evs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val users = byType(r.getString(0)).groupBy(_._2)
      val s1 = users.filter(_._2.exists(e => h8(e._3.toString) % 5 == 0)).keySet
      val s2 = users.filter(_._2.exists(e => h8(e._3.toString) % 5 == 1)).keySet
      val m = (s1 intersect s2).size.toLong
      assert(r.getLong(1) === users.size.toLong)
      assert(r.getLong(2) === s1.size.toLong)
      assert(r.getLong(3) === s2.size.toLong)
      assert(r.getLong(4) === m)
      assert(r.getLong(5) === s1.size.toLong * s2.size / math.max(m, 1L))
      assert(r.getLong(6) === (s1.size + 1L) * (s2.size + 1L) / (m + 1L) - 1L)
      // Chapman is defined (≥ max single-capture count) when m > 0
      if (m > 0) assert(r.getLong(6) >= math.max(s1.size, s2.size).toLong)
    }
  }

  test("sequential A/B: daily trajectory recomputed in driver, corrected flag implies naive (q242)") {
    val rows = EventOps.queries("q242_sequential_ab")(spark, sf001).collect()
    def variant(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2
    }
    val evs = graft.T.events(spark, sf001)
      .selectExpr("user_id", "CAST(datediff(to_date(ts), date'2024-01-01') AS BIGINT) AS day",
        "event_type = 'purchase' AS isp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byUser = evs.groupBy(_._1)
    assert(rows.length.toLong === evs.map(_._2).max - evs.map(_._2).min + 1)
    var prevNa = 0L
    rows.foreach { r =>
      val day = r.getLong(0)
      val active = byUser.filter { case (_, es) => es.map(_._2).min <= day }
      val na = active.keys.count(variant(_) == 0).toLong
      val nb = active.size - na
      def conv(v: Long) = active.count { case (u, es) =>
        variant(u) == v && es.count(e => e._3 && e._2 <= day) >= 5
      }.toLong
      assert(r.getLong(1) === na && r.getLong(2) === nb)
      assert(r.getLong(3) === conv(0) && r.getLong(4) === conv(1))
      val (ca, cb) = (conv(0), conv(1))
      if (na > 0 && nb > 0 && ca + cb > 0 && ca + cb < na + nb) {
        val p0 = (ca + cb).toDouble / (na + nb)
        val z = (ca.toDouble / na - cb.toDouble / nb) /
          math.sqrt(p0 * (1.0 - p0) * (1.0 / na + 1.0 / nb))
        assert(r.getLong(5) === math.floor(1000 * z).toLong, s"day $day z")
      } else assert(r.isNullAt(5))
      assert(r.getLong(7) <= r.getLong(6), "corrected can only fire when naive does")
      assert(na >= prevNa, "the enrolled population can only grow"); prevNa = na
    }
  }

  test("mwu ppm tier: z unchanged from the exact tier, u_ppm is the floored U image (q246b)") {
    val exact = EventOps.queries("q246_mann_whitney")(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = EventOps.queries("q246b_mwu_ppm")(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      val e = exact(r.getString(0))
      // rollups identical; the widened DECIMAL path must not move them
      assert(r.getLong(1) === e.getLong(1) && r.getLong(2) === e.getLong(2))
      // the z statistic is UNCHANGED by the widening (same exact
      // integers through the same correctly-rounded double tree)
      if (e.isNullAt(4)) assert(r.isNullAt(4))
      else assert(r.getLong(4) === e.getLong(4), s"${r.getString(0)} z drifted")
      assert(r.getLong(5) === e.getLong(5))
      // u_ppm = floor(1e6 * U1 / (n_a * n_b)) from the exact twice-U1
      val (na, nb, u1x2) = (e.getLong(1), e.getLong(2), e.getLong(3))
      assert(r.getLong(3) === 1000000L * u1x2 / (2L * na * nb),
        s"${r.getString(0)} u_ppm")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }

  test("emd ppm tier: share algebra recomputed, tracks the exact tier within the floor bound (q241b)") {
    val exact = EventOps.queries("q241_emd_drift")(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = EventOps.queries("q241b_emd_ppm")(spark, sf001).collect()
    val evs = graft.T.events(spark, sf001)
      .selectExpr("event_type",
        "CAST(datediff(to_date(ts), date'2024-01-01') AS INT) < 15 AS is_a",
        "CAST(round(value * 100) AS BIGINT) div 2000 AS bin")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      val e = exact(r.getString(0))
      (1 to 3).foreach(i => assert(r.getLong(i) === e.getLong(i)))
      // driver recompute of the ppm share walk
      val grp = evs.filter(_._1 == r.getString(0))
      val (b0, b1) = (grp.map(_._3).min, grp.map(_._3).max)
      val ta = grp.count(_._2).toLong
      val tb = grp.length - ta
      var (cuma, cumb, sdPpm) = (0L, 0L, 0L)
      (b0 to b1).foreach { b =>
        cuma += grp.count(x => x._2 && x._3 == b)
        cumb += grp.count(x => !x._2 && x._3 == b)
        sdPpm += math.abs(cuma * 1000000L / ta - cumb * 1000000L / tb)
      }
      assert(r.getLong(4) === sdPpm, s"${r.getString(0)} sd_ppm")
      assert(r.getLong(5) === 200000L * sdPpm / 1000000L)
      // each share floors < 1 ppm -> per-bin gap error < 2 ppm; the
      // ppm EMD tracks the exact tier within ~0.4 centi-cents per bin
      val bins = r.getLong(3)
      assert(math.abs(r.getLong(5) - e.getLong(4)).toDouble <= 0.4 * bins + 2,
        s"${r.getString(0)}: ppm EMD ${r.getLong(5)} vs exact ${e.getLong(4)}")
    }
  }

  test("emd drift: exact-integer area between CDFs recomputed in the driver (q241)") {
    val rows = EventOps.queries("q241_emd_drift")(spark, sf001).collect()
    val evs = graft.T.events(spark, sf001)
      .selectExpr("event_type",
        "CAST(datediff(to_date(ts), date'2024-01-01') AS INT) < 15 AS is_a",
        "CAST(round(value * 100) AS BIGINT) div 2000 AS bin")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val grp = evs.filter(_._1 == r.getString(0))
      val (b0, b1) = (grp.map(_._3).min, grp.map(_._3).max)
      val ta = grp.count(_._2).toLong
      val tb = grp.length - ta
      var (cuma, cumb, sd) = (0L, 0L, 0L)
      (b0 to b1).foreach { b =>
        cuma += grp.count(e => e._2 && e._3 == b)
        cumb += grp.count(e => !e._2 && e._3 == b)
        sd += math.abs(cuma * tb - cumb * ta)
      }
      assert(r.getLong(1) === ta)
      assert(r.getLong(2) === tb)
      assert(r.getLong(3) === b1 - b0 + 1)
      assert(r.getLong(4) === 200000L * sd / (ta * tb), s"${r.getString(0)} emd")
      // the last boundary contributes zero: both CDFs have closed
      assert(cuma === ta && cumb === tb)
    }
  }

  test("dp sensitivity: max single-user contribution recomputed from raw events (q237)") {
    val rows = EventOps.queries("q237_dp_sensitivity")(spark, sf001).collect()
    val evs = graft.T.events(spark, sf001)
      .selectExpr("event_type", "user_id", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = evs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val users = byType(r.getString(0)).groupBy(_._2).values.toSeq
      assert(r.getLong(1) === users.length.toLong)
      assert(r.getLong(2) === users.map(_.length.toLong).sum)
      assert(r.getLong(3) === users.map(_.length.toLong).max)
      assert(r.getLong(4) === users.map(_.map(_._3).sum).max)
      assert(r.getLong(6) === 1000000L * r.getLong(3) / r.getLong(2))
      // no user's share can exceed the whole
      assert(r.getLong(6) <= 1000000L && r.getLong(7) <= 1000000L)
    }
  }

  test("twap: exact-integer recompute per user-day, bracketed by min/max cents (q235)") {
    val rows = EventOps.queries("q235_twap")(spark, sf001).collect()
    val evs = graft.T.events(spark, sf001)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day", "event_id",
        "unix_micros(ts) AS ep", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getLong(4)))
    val byGroup = evs.groupBy(e => (e._1, e._2))
    assert(rows.length === byGroup.size)
    rows.foreach { r =>
      val grp = byGroup((r.getLong(0), r.getDate(1).toString))
        .sortBy(e => (e._4, e._3))
      val den = grp.last._4 - grp.head._4
      val (wantC, wantF) =
        if (den == 0L) (grp.minBy(_._3)._5, 0L)
        else {
          val num = grp.zip(grp.tail)
            .map { case (a, b) => a._5 * (b._4 - a._4) }.sum
          (num / den, ((num % den) * 1000000L) / den)
        }
      assert(r.getLong(2) === grp.length.toLong)
      assert(r.getLong(3) === wantC, s"group ${(r.getLong(0), r.getDate(1))} twap")
      assert(r.getLong(4) === wantF)
      // a time-weighted average cannot escape the value envelope
      val (lo, hi) = (grp.map(_._5).min, grp.map(_._5).max)
      assert(r.getLong(3) >= lo - 1 && r.getLong(3) <= hi)
    }
  }

  test("psi drift: full driver-side recompute matches, PSI non-negative (q232)") {
    val rows = EventOps.queries("q232_psi_drift")(spark, sf001).collect()
    val evs = graft.T.events(spark, sf001)
      .selectExpr("event_type", "event_id",
        "CAST(datediff(to_date(ts), date'2024-01-01') AS INT) AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val all = evs.filter(_._1 == et)
      val a = all.filter(_._3 < 15).sortBy(t => (t._4, t._2))
      val n = a.length
      assert(n >= 10, s"$et reference slice too small for the spec's ntile")
      val base = n / 10; val rem = n % 10
      val sizes = (1 to 10).map(i => if (i <= rem) base + 1 else base)
      val bounds = sizes.scanLeft(0)(_ + _).tail.dropRight(1).map(end => a(end - 1)._4)
      def bin(c: Long) = 1 + bounds.count(b => c > b)
      val cells = all.groupBy(e => (bin(e._4), e._3 < 15)).view.mapValues(_.size).toMap
      val ta = n.toDouble
      val tb = (all.length - n).toDouble
      val psi = (1 to 10).map { bn =>
        val na = cells.getOrElse((bn, true), 0).toDouble
        val nb = cells.getOrElse((bn, false), 0).toDouble
        if (na > 0 && nb > 0) (na / ta - nb / tb) * math.log((na / ta) / (nb / tb))
        else 0.0
      }.sum
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === tb.toLong)
      assert(r.getDouble(4) >= 0.0, "PSI terms share sign — the sum cannot go negative")
      assert(math.abs(r.getDouble(4) - psi) < 1e-3, s"$et psi got ${r.getDouble(4)} want $psi")
    }
  }

  test("seasonal decomposition: identity holds, edges have no trend, seasonal keyed by dow (q229)") {
    val rows = EventOps.queries("q229_seasonal_decomp")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(rows.nonEmpty)
    assert(rows.exists(_._4.isDefined), "some interior day must carry a trend")
    rows.groupBy(_._1).foreach { case (et, ds) =>
      val days = ds.map(_._2).sorted
      ds.foreach { case (_, day, c, trend, seasonal, resid) =>
        val interior =
          days.count(x => x >= day - 3 && x <= day + 3) == 7
        assert(trend.isDefined === interior, s"$et day=$day trend presence")
        assert(resid.isDefined === (interior && seasonal.isDefined))
        (trend, seasonal, resid) match {
          case (Some(t), Some(sn), Some(rs)) =>
            // additive identity up to the three roundings
            assert(math.abs(c - t - sn - rs) < 3e-4, s"$et day=$day identity")
          case _ =>
        }
      }
      // seasonal is a pure function of (type, dow)
      ds.groupBy(_._2 % 7).foreach { case (_, slot) =>
        assert(slot.map(_._5).distinct.length === 1)
      }
    }
  }

  test("theilsen: brute-force median of truncated pairwise slopes matches (q226)") {
    val rows = EventOps.queries("q226_theilsen")(spark, sf001).collect()
    val byType = dailyCounts()
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val ds = byType(r.getString(0))
      val slopes = (for {
        i <- ds.indices; j <- (i + 1) until ds.length
      } yield ((1000000L * (ds(j)._2 - ds(i)._2)) /
               (ds(j)._1 - ds(i)._1).toDouble).toLong).sorted
      val n = slopes.length
      val med =
        if (n % 2 == 1) slopes(n / 2).toDouble
        else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) === med)
      val trend = if (med > 0) "up" else if (med < 0) "down" else "flat"
      assert(r.getString(3) === trend)
    }
  }
}
