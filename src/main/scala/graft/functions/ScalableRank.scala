package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed ranking for LOW-CARDINALITY window partition
  * keys (round-3 verdict item 1).
  *
  * `Window.partitionBy(k)` hash-partitions on k: with |k| ≈ 5 distinct
  * values, 100 TB funnels onto 5 tasks, each sorting n/5 rows — the
  * classic window scale-killer. The reference can't hit this (MySQL
  * windows are single-node anyway, /root/reference/main.go:106), but a
  * Spark re-expression must not inherit the shape.
  *
  * Scheme (the standard two-phase/global-ranking decomposition):
  *   1. `repartitionByRange(P, key ++ order)` — rows land in P range
  *      partitions that respect the GLOBAL (key, order) sort order, so
  *      one key's rows span many partitions, each bounded by n/P.
  *   2. Local ranks per (partition, key) via an ordinary window — its
  *      hash exchange distributes over P×|k| keys, every group bounded
  *      by the range-partition size (never by n/|k|).
  *   3. Per-(partition, key) row/distinct counts — a TINY relation
  *      (≤ P×|k| rows) — prefix-summed per key in pid order and
  *      broadcast back as offsets. Global rank = offset + local rank.
  *
  * Why the per-rank algebra is exact:
  *   - equal (key, order) tuples hash to the SAME range partition
  *     (RangePartitioner assigns by the full tuple), so ties never
  *     straddle a partition boundary;
  *   - therefore every row in an earlier partition of the same key is
  *     STRICTLY smaller: row_number/rank add the plain row-count
  *     offset, dense_rank adds the distinct-tuple-count offset
  *     (= max local dense_rank), and the cumulative count (for
  *     cume_dist) adds the row-count offset to the last local row
  *     number within the tie group.
  *
  * ntile / percent_rank / cume_dist derive from (rn, rnk, cume, ntot)
  * with closed-form expressions — see [[ntileFrom]].
  */
object ScalableRank {

  /** Appends global per-key ranking columns to `df`:
    *   rn    — row_number over (keys; order ++ suffix)  (long)
    *   rnk   — rank over (keys; order)                   (long)
    *   drnk  — dense_rank over (keys; order)             (long)
    *   cume  — #rows with order-tuple ≤ current          (long, for cume_dist)
    *   ntot  — total rows for this key                   (long)
    *
    * @param keys   window partition key column NAMES (low-cardinality —
    *               that's the case this exists for)
    * @param order  the rank-DEFINING ordering columns, direction
    *               included (e.g. col("x").desc): rows equal on all of
    *               them are rank ties. The range partitioning uses
    *               exactly these, so a tie group never straddles a
    *               partition — the invariant the offset algebra needs.
    *               (Consequence: one tie group is one partition's work;
    *               a rank tie IS a single rank, that's inherent.)
    * @param suffix extra directed columns completing a UNIQUE total
    *               order for row_number/ntile determinism; excluded
    *               from rank/dense_rank tie semantics and from the
    *               range partitioning. Empty if `order` is unique
    *               (then rnk == rn and drnk == rn).
    * @param tie    the `order` columns WITHOUT direction (for the
    *               tie-group window; direction is irrelevant to
    *               equality)
    * @param numPartitions range-partition count — the parallelism the
    *               single-key sort is spread across
    */
  def withRanks(df: DataFrame, keys: Seq[String], order: Seq[Column],
                tie: Seq[Column], numPartitions: Int,
                suffix: Seq[Column] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    // Phase 1: order-respecting partition ids. __pid is the physical
    // range-partition index: deterministic (RangePartitioner bounds are
    // sampled with a fixed per-rdd seed, and partition assignment is a
    // pure function of the (keys, order) tuple — equal tuples always
    // land together) and monotone in (keys, order).
    val parted = df
      .repartitionByRange(numPartitions, (keyCols ++ order): _*)
      .withColumn("__pid", spark_partition_id())
    // Phase 2: local ranks. The window's exchange hashes on
    // (__pid, keys) — P×|k| groups, each bounded by a range-partition.
    // rank = row_number of the tie group's first row (min over the tie
    // window); dense_rank orders by the tie-defining columns only.
    val wLoc = Window.partitionBy(col("__pid") +: keyCols: _*)
      .orderBy(order ++ suffix: _*)
    val wDense = Window.partitionBy(col("__pid") +: keyCols: _*).orderBy(order: _*)
    val wTie = Window.partitionBy((col("__pid") +: keyCols) ++ tie: _*)
    val local = parted
      .withColumn("__ln", row_number().over(wLoc).cast("long"))
      .withColumn("__ldr", dense_rank().over(wDense).cast("long"))
      .withColumn("__lrk", min(col("__ln")).over(wTie))
      .withColumn("__lcume", max(col("__ln")).over(wTie))
      // CRITICAL: materialize ONCE (lazily). The offsets below are a
      // second consumer of this plan; without materialization each
      // consumer re-executes the range exchange, and because
      // spark_partition_id() is nondeterministic Catalyst will not
      // always reuse the exchange — re-sampled range boundaries can
      // then assign DIFFERENT __pid values on the two sides, silently
      // corrupting every offset. The checkpoint stores the ranked
      // relation in executor block storage — the same order of cost as
      // the window's own shuffle files (on a cluster with lossy
      // executors, swap for .checkpoint with a reliable dir, exactly
      // as Components documents).
      .localCheckpoint(false)
    // Phase 3: offsets. ≤ P×|k| rows — the window below and the
    // broadcast are on a relation the driver could print.
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wKey = Window.partitionBy(keyCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = local
      .groupBy(col("__pid") +: keyCols: _*)
      .agg(count(lit(1)).as("__n"), max(col("__ldr")).as("__nd"))
      // ≤ P×|k| rows: collapse to one partition BEFORE the prefix-sum
      // windows. SinglePartition satisfies their ClusteredDistribution,
      // so no exchange ever hash-partitions on the low-cardinality key
      // alone — the property PlanAuditSpec pins down.
      .coalesce(1)
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .withColumn("__doff", coalesce(sum(col("__nd")).over(wOff), lit(0L)))
      .withColumn("ntot", sum(col("__n")).over(wKey))
      .select((col("__pid") +: keyCols) ++ Seq(col("__off"), col("__doff"), col("ntot")): _*)
    local
      .join(broadcast(offsets), "__pid" +: keys)
      .withColumn("rn", col("__off") + col("__ln"))
      .withColumn("rnk", col("__off") + col("__lrk"))
      .withColumn("drnk", col("__doff") + col("__ldr"))
      .withColumn("cume", col("__off") + col("__lcume"))
      .drop("__pid", "__ln", "__lrk", "__ldr", "__lcume", "__off", "__doff")
  }

  /** Appends a global per-key running sum of `value` over `order`
    * (ROWS UNBOUNDED PRECEDING .. CURRENT ROW) as column `rsum` — the
    * same two-phase decomposition as [[withRanks]]: local running sums
    * per range partition plus broadcast prefix-summed partition totals.
    *
    * This is the building block for value-RANGE frames over
    * low-cardinality keys (q33): a trailing-range count is the
    * difference of two cumulative counts, each obtainable from a
    * running sum over a probe-row union (see ops/Windows.scala).
    *
    * Rows equal on the full `order` tuple are co-located (range
    * partitioning is by the tuple), but their mutual order is
    * arbitrary — among tied rows the per-row running sum is only
    * deterministic if tied rows carry equal contributions (e.g. the
    * probe rows of a cumulative-count union, which contribute 0) or if
    * `order` is unique. Callers own that invariant.
    */
  def withRunningSum(df: DataFrame, keys: Seq[String], order: Seq[Column],
                     value: Column, numPartitions: Int): DataFrame = {
    val keyCols = keys.map(col)
    val parted = df
      .repartitionByRange(numPartitions, (keyCols ++ order): _*)
      .withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pid") +: keyCols: _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same single-materialization requirement as withRanks: the offsets
    // join is a second consumer of the pid-bearing plan
    val local = parted.withColumn("__lrs", sum(value).over(wLoc))
      .localCheckpoint(false)
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__pid") +: keyCols: _*)
      .agg(sum(value).as("__t"))
      .coalesce(1) // ≤ P×|k| rows; SinglePartition, no key-only exchange
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select((col("__pid") +: keyCols) :+ col("__off"): _*)
    local
      .join(broadcast(offsets), "__pid" +: keys)
      .withColumn("rsum", col("__off") + col("__lrs"))
      .drop("__pid", "__lrs", "__off")
  }

  /** Appends, per key over `order` (ROWS UNBOUNDED PRECEDING .. CURRENT
    * ROW), the running sum of `value` (`rsum`) AND the running min/max
    * of that running sum (`rmin`/`rmax`) — the drawdown primitive:
    * max(rsum - rmin) is the maximum drawup (≡ maximum-subarray sum of
    * the deltas), max(rmax - rsum) the maximum drawdown. Same two-phase
    * decomposition as [[withRunningSum]], still ONE pass over the data:
    * the nested "running min of a running sum" folds into the tiny
    * offsets relation because a range partition's contribution to the
    * global prefix extremum is just (its exclusive sum offset + its
    * local extremum of the local running sum), prefix-min/maxed in pid
    * order over ≤ P×|k| rows. `order` must be a unique total order per
    * key (running extrema of tied rows are otherwise arbitrary).
    */
  def withRunningSumMinMax(df: DataFrame, keys: Seq[String], order: Seq[Column],
                           value: Column, numPartitions: Int): DataFrame = {
    val keyCols = keys.map(col)
    val parted = df
      .repartitionByRange(numPartitions, (keyCols ++ order): _*)
      .withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pid") +: keyCols: _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one ordered window feeds all three locals; same single-
    // materialization requirement as withRanks (offsets re-consume __pid)
    val local = parted
      .withColumn("__lrs", sum(value).over(wLoc))
      .withColumn("__lrm", min(col("__lrs")).over(wLoc))
      .withColumn("__lrx", max(col("__lrs")).over(wLoc))
      .localCheckpoint(false)
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__pid") +: keyCols: _*)
      .agg(sum(value).as("__t"), min(col("__lrs")).as("__pmin"),
        max(col("__lrs")).as("__pmax"))
      .coalesce(1) // ≤ P×|k| rows; SinglePartition, no key-only exchange
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .withColumn("__moff", min(col("__off") + col("__pmin")).over(wOff))
      .withColumn("__xoff", max(col("__off") + col("__pmax")).over(wOff))
      .select((col("__pid") +: keyCols) ++
        Seq(col("__off"), col("__moff"), col("__xoff")): _*)
    local
      .join(broadcast(offsets), "__pid" +: keys)
      .withColumn("rsum", col("__off") + col("__lrs"))
      // least/greatest skip NULLs (first partition has no predecessor)
      .withColumn("rmin", least(col("__moff"), col("__off") + col("__lrm")))
      .withColumn("rmax", greatest(col("__xoff"), col("__off") + col("__lrx")))
      .drop("__pid", "__lrs", "__lrm", "__lrx", "__off", "__moff", "__xoff")
  }

  /** Column `/` is double division in Spark — ranking arithmetic needs
    * floor division. floor over doubles is exact below 2^53, far above
    * any real row count (2^53 rows ≈ 9e15).
    */
  private def idiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** SQL-standard NTILE(t) from a global row_number and the key total:
    * the first (ntot % t) buckets get ceil(ntot/t) rows, the rest get
    * floor(ntot/t) — exactly Spark's and DuckDB's assignment, derived
    * arithmetically instead of through a single-task window. When
    * ntot < t, base = 0, but every row then satisfies rn <= cut, and
    * CaseWhen evaluates branches lazily per row — the zero divisor is
    * never touched.
    */
  def ntileFrom(rn: Column, ntot: Column, t: Int): Column = {
    val base = idiv(ntot, lit(t))
    val rem = ntot.cast("long") % t
    val cut = rem * (base + 1) // rows covered by the big buckets
    when(rn <= cut, idiv(rn - 1, base + 1) + 1)
      .otherwise(rem + idiv(rn - cut - 1, base) + 1)
  }

  /** percent_rank = (rank - 1) / (ntot - 1), 0 for a single-row key. */
  def percentRankFrom(rnk: Column, ntot: Column): Column =
    when(ntot > 1, (rnk - 1).cast("double") / (ntot - 1).cast("double"))
      .otherwise(lit(0.0))

  /** cume_dist = (#rows ≤ current) / ntot. */
  def cumeDistFrom(cume: Column, ntot: Column): Column =
    cume.cast("double") / ntot.cast("double")
}
