package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostics-driven WINDOW strategy selection — the third leg of the
  * skew trilogy ([[AdaptiveJoin]] for joins, [[AdaptiveAgg]] for
  * aggregations): the `q_skew_profile` max-key statistic picks between
  * Spark's plain per-key Window and a split-partition two-phase rank
  * for `row_number() OVER (PARTITION BY key ORDER BY ord...)`.
  *
  * Why windows are the WORST skew surface of the three: a per-key
  * Window puts each key's ENTIRE row set through one task's sort —
  * map-side combine can't help (every row survives), so a hot key is
  * one straggler task sorting (and spilling) the whole key no matter
  * how many executors exist. The engine already documents the surface
  * at q_perplexity_bucket (5 languages ⇒ 5 sort partitions at ANY
  * corpus size).
  *
  * The two shapes, both computing the identical rank:
  *   - PLAIN_WINDOW: one exchange on `key`, one sort per key. Right
  *     when keys are plentiful and balanced — cheapest possible plan.
  *   - RANGE_PREFIX: a DETERMINISTIC split id `__pid` — the count of
  *     frozen boundary tuples strictly below each row's (key, ord...)
  *     tuple, where the boundaries come from ONE bounded fixed-seed
  *     sample job and are baked into the plan as literals — splits a
  *     hot key across many (pid, key) window partitions; a local rank
  *     per (pid, key) plus a broadcast prefix-sum of per-(pid, key)
  *     counts turns local positions into exact global ranks. No task
  *     ever sorts more than one split's rows, and the offsets frame is
  *     (splits + keys)-sized, never row-sized.
  *
  * Why literal boundaries instead of `repartitionByRange` (advice-r15):
  * the range partitioner samples with a per-RDD seed, so two separate
  * evaluations of the same subtree can land rows in DIFFERENT
  * partitions — the old shape referenced the ranged frame from both
  * the offsets subtree and the probe side of the join, and was correct
  * only while Spark's exchange-reuse rule deduplicated the two
  * evaluations (`spark.sql.exchange.reuse=false`, or any future plan
  * canonicalization divergence, would silently mis-rank). Here `__pid`
  * is a pure codegen'd function of the row's own values against frozen
  * literals, so every evaluation agrees BY CONSTRUCTION — and the plan
  * drops the range exchange entirely (one hash exchange on (pid, key)
  * instead of range + hash). Monotonicity makes the prefix math exact:
  * `#boundaries < tuple` never decreases as the tuple grows, so within
  * a key all rows in split i sort before all rows in split j>i; rows
  * whose tuple comparison is NULL (a NULL key or ord field) land in
  * split 0, which is consistent with NULLS FIRST ascending order. The
  * ORDER columns must end in a unique tiebreaker (enforced by
  * contract), so ranks are boundary-placement-invariant.
  *
  * Strategy is result-invariant by construction (the consuming query
  * is oracle-checked against the plain SQL window), and the decision
  * flips on the measured statistic exactly like its two siblings.
  *
  * 100 TB shape: the diagnostic is one map-side-combined key-count
  * aggregate reduced to a single driver row (memoized per (table, key)
  * via SessionMemo — see [[graft.engine.AdaptiveStats]]); the sample
  * job collects ~20×splits tuples; RANGE_PREFIX then costs one hash
  * exchange + a broadcast of the bounded counts frame — many
  * bounded-task sorts instead of one unbounded one.
  */
object AdaptiveWindow {

  sealed trait Strategy { def label: String }
  case object PlainWindow extends Strategy { val label = "plain_window" }
  case object RangePrefix extends Strategy { val label = "range_prefix" }

  /** Pure decision function — spec-pinned flip point. */
  def decide(maxKeyRows: Long, rowCap: Long): Strategy =
    if (maxKeyRows > rowCap) RangePrefix else PlainWindow

  /** Boundary-sample size per split — Spark's own
    * samplePointsPerPartitionHint default; enough to place boundaries
    * within a few percent of even splits, bounded on the driver.
    */
  val SamplePointsPerSplit = 20

  /** Measure → decide → build: `row_number()` per `key` ordered by
    * `ord` (which MUST end in a unique tiebreaker — rank equality
    * under ties would otherwise depend on physical row placement in
    * BOTH shapes). The (max-key, total) statistic is ONE
    * map-side-combined job, memoized per (source, key) so sibling
    * adaptive operators on the same column never pay a second scan.
    */
  def adaptiveRank(df: DataFrame, key: String, ord: Seq[String],
      out: String, rowCap: Long): (Strategy, DataFrame) = {
    val stats = graft.engine.AdaptiveStats.keyStats(df, key)
    val strategy = decide(stats.maxKeyRows, rowCap)
    (strategy, buildRank(df, key, ord, out, strategy, stats.totalRows))
  }

  /** The two ranking shapes behind one result contract; public so the
    * forced-regime query and the plan gates address each directly.
    * This overload measures the total row count itself when the
    * strategy needs it; callers that already hold the diagnostic pass
    * it through the 6-arg overload.
    */
  def buildRank(df: DataFrame, key: String, ord: Seq[String],
      out: String, strategy: Strategy): DataFrame = {
    val total = strategy match {
      case RangePrefix => graft.engine.AdaptiveStats.keyStats(df, key)
        .totalRows
      case PlainWindow => 0L
    }
    buildRank(df, key, ord, out, strategy, total)
  }

  def buildRank(df: DataFrame, key: String, ord: Seq[String],
      out: String, strategy: Strategy, totalRows: Long): DataFrame =
    strategy match {
      case PlainWindow =>
        df.withColumn(out, row_number().over(
          Window.partitionBy(key).orderBy(ord.map(col): _*)))
      case RangePrefix =>
        val withPid = df.withColumn("__pid",
          splitId(df, (key +: ord).map(col), totalRows))
        // (split, key) row counts — bounded by splits + keys, never by
        // rows — turned into exclusive prefix sums per key in split
        // order, then broadcast back
        val offsets = withPid.groupBy(col("__pid"), col(key))
          .agg(count(lit(1)).as("__cnt"))
          .withColumn("__off",
            coalesce(sum(col("__cnt")).over(
              Window.partitionBy(key).orderBy("__pid")
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("__pid"), col(key), col("__off"))
        // local rank within (split, key) — each window partition is at
        // most one split's slice of the key, so the hot key's sort is
        // spread across tasks — plus the broadcast offset
        withPid.join(broadcast(offsets), Seq("__pid", key))
          .withColumn(out,
            (row_number().over(Window.partitionBy(col("__pid"), col(key))
              .orderBy(ord.map(col): _*)) + col("__off")).cast("int"))
          .drop("__pid", "__off")
    }

  /** The deterministic split id: `#frozenBoundaries < tuple`, a
    * codegen'd fold of struct comparisons against literal boundary
    * tuples sampled ONCE (fixed seed, ~[[SamplePointsPerSplit]]×splits
    * rows collected) — every evaluation of the expression agrees, with
    * no dependence on exchange reuse or partitioner seeding. NULL
    * comparisons (NULL key/ord fields) yield split 0, matching NULLS
    * FIRST ascending order, so monotonicity — and therefore the prefix
    * math — still holds.
    */
  private[graft] def splitId(df: DataFrame, rangeCols: Seq[Column],
      totalRows: Long): Column = {
    val spark = df.sparkSession
    val splits = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val sampleTarget = splits.toLong * SamplePointsPerSplit
    val fraction =
      if (totalRows <= 0L) 1.0
      else math.min(1.0, sampleTarget.toDouble / totalRows)
    val tupleDf = df.select(rangeCols: _*)
    val names = tupleDf.columns
    val sample: Array[Row] = tupleDf
      .sample(withReplacement = false, fraction, seed = 7L)
      .na.drop("any") // NULL-bearing tuples belong to split 0 anyway
      .sort(names.map(col): _*)
      .limit((sampleTarget * 4).toInt) // hard driver bound
      .collect()
    val stride = math.max(1, sample.length / splits)
    val boundaries = (stride until sample.length by stride)
      .take(splits - 1).map(sample(_))
    val tuple = struct(names.map(col): _*)
    // boundary rows → literal structs with MATCHING field names (struct
    // comparison type-checks names); lit() handles the external row
    // types (String/numeric/Timestamp/Date) collect() returns
    val pid = boundaries.map { b =>
      val bLit = struct(names.zipWithIndex.map { case (n, i) =>
        lit(b.get(i)).as(n)
      }: _*)
      when(tuple > bLit, 1).otherwise(0)
    }.reduceOption(_ + _).getOrElse(lit(0))
    pid.cast("int")
  }
}
