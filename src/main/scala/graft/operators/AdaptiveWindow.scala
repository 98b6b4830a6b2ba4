package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostics-driven WINDOW strategy selection — the third leg of the
  * skew trilogy ([[AdaptiveJoin]] for joins, [[AdaptiveAgg]] for
  * aggregations): the `q_skew_profile` max-key statistic picks between
  * Spark's plain per-key Window and a range-partitioned two-phase rank
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
  *   - RANGE_PREFIX: global range partition on (key, ord...) — the
  *     range partitioner splits a hot key across MANY partitions
  *     because boundaries are full (key, ord) tuples — then a local
  *     rank per (partition, key) plus a broadcast prefix-sum of
  *     per-(partition, key) counts turns local positions into exact
  *     global ranks. No task ever sorts more than one partition's
  *     rows. The offsets frame is (partitions + keys)-sized, never
  *     row-sized. Correctness does not depend on where the sampled
  *     range boundaries land: the ORDER columns must end in a unique
  *     tiebreaker (enforced by contract), so every row's global
  *     position — and therefore its rank — is boundary-invariant.
  *
  * Strategy is result-invariant by construction (the consuming query
  * is oracle-checked against the plain SQL window), and the decision
  * flips on the measured statistic exactly like its two siblings.
  *
  * 100 TB shape: the diagnostic is one map-side-combined key-count
  * aggregate reduced to a single driver row; RANGE_PREFIX costs one
  * range exchange + one (pid, key) hash exchange + a broadcast of the
  * counts frame — two bounded-task sorts instead of one unbounded one.
  */
object AdaptiveWindow {

  sealed trait Strategy { def label: String }
  case object PlainWindow extends Strategy { val label = "plain_window" }
  case object RangePrefix extends Strategy { val label = "range_prefix" }

  /** Pure decision function — spec-pinned flip point. */
  def decide(maxKeyRows: Long, rowCap: Long): Strategy =
    if (maxKeyRows > rowCap) RangePrefix else PlainWindow

  /** Measure → decide → build: `row_number()` per `key` ordered by
    * `ord` (which MUST end in a unique tiebreaker — rank equality
    * under ties would otherwise depend on physical row placement in
    * BOTH shapes).
    */
  def adaptiveRank(df: DataFrame, key: String, ord: Seq[String],
      out: String, rowCap: Long): (Strategy, DataFrame) = {
    val maxKeyRows = df.groupBy(key).agg(count(lit(1)).as("__n"))
      .agg(coalesce(max(col("__n")), lit(0L))).head().getLong(0)
    val strategy = decide(maxKeyRows, rowCap)
    (strategy, buildRank(df, key, ord, out, strategy))
  }

  /** The two ranking shapes behind one result contract; public so the
    * forced-regime query and the plan gates address each directly.
    */
  def buildRank(df: DataFrame, key: String, ord: Seq[String],
      out: String, strategy: Strategy): DataFrame = strategy match {
    case PlainWindow =>
      df.withColumn(out, row_number().over(
        Window.partitionBy(key).orderBy(ord.map(col): _*)))
    case RangePrefix =>
      val rangeCols: Seq[Column] = (key +: ord).map(col)
      val withPid = df.repartitionByRange(rangeCols: _*)
        .sortWithinPartitions(rangeCols: _*)
        .withColumn("__pid", spark_partition_id())
      // (partition, key) row counts — bounded by partitions + keys,
      // never by rows — turned into exclusive prefix sums per key in
      // partition order, then broadcast back
      val offsets = withPid.groupBy(col("__pid"), col(key))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("__off",
          coalesce(sum(col("__cnt")).over(
            Window.partitionBy(key).orderBy("__pid")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("__pid"), col(key), col("__off"))
      // local rank within (partition, key) — each window partition is
      // at most one range partition's slice of the key, so the hot
      // key's sort is split across tasks — plus the broadcast offset
      withPid.join(broadcast(offsets), Seq("__pid", key))
        .withColumn(out,
          (row_number().over(Window.partitionBy(col("__pid"), col(key))
            .orderBy(ord.map(col): _*)) + col("__off")).cast("int"))
        .drop("__pid", "__off")
  }
}
