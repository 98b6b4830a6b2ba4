package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostics-driven AGGREGATION strategy selection (VERDICT r14 #2) —
  * [[AdaptiveJoin]]'s loop applied to the groupBy side: the
  * `q_skew_profile` max-key statistic picks between Catalyst's Expand
  * plan and a hand-lowered per-family aggregation for a hot-key groupBy
  * that carries MULTIPLE exact-distinct columns.
  *
  * What skew actually threatens here (and what it doesn't — measured on
  * this engine's plans, not folklore): for purely algebraic aggregates
  * (count/sum/min/max) a hot group key is HARMLESS — map-side partial
  * aggregation collapses each partition to one row per key before the
  * exchange. A SINGLE exact-distinct column is ALSO already handled:
  * Catalyst's single-distinct rewrite plans exactly the two-level shape
  * (partial agg keyed (key, distinct), exchange on both — the distinct
  * column spreads the hot key), so hand-lowering it would change
  * nothing. The genuine victim is the MULTI-distinct aggregate:
  * Catalyst's only general plan is Expand — every input row is
  * replicated once per aggregate family (3x for two distincts + the
  * algebraic family), and the replicas flow through the first hash
  * aggregate and exchange. The hot key's row stream pays the full
  * replication factor at the point of maximum volume.
  *
  * The two shapes, both computing the identical result:
  *   - EXPAND (Catalyst's default): one scan, rows x (families+1)
  *     through partial aggregation. Right when no key is hot and the
  *     input is modest: one pass, no join.
  *   - PER_FAMILY: one two-level aggregate per distinct family — level
  *     1 groups by (key, family column), so the family column is the
  *     salt that spreads the hot key while map-side combine collapses
  *     duplicate pairs at 1x wire; the algebraic aggregates ride the
  *     first family's pass — then the family results join back on the
  *     group key (group-cardinality-sized, broadcast). Costs one extra
  *     column-pruned scan per extra family; never replicates a row.
  *
  * Strategy is result-invariant by construction, so the consuming query
  * is oracle-checkable against the plain aggregate (the
  * `q_adaptive_join` pattern), and the decision itself is oracle-gated
  * by hardcoded strategy labels per forced regime
  * (`q_adaptive_join_regimes` pattern).
  *
  * 100 TB shape: the diagnostic is one map-side-combined key-count
  * aggregate reduced to a single driver row; the Expand shape's wire is
  * (families+1) x the distinct-collapsed row volume, the per-family
  * shape's is the sum of each family's collapsed volume plus one
  * broadcast of a group-key-sized frame — the decision trades scan
  * passes against replicated shuffle volume, and a hot key pushes the
  * trade toward PER_FAMILY because replication concentrates exactly
  * where the volume already is.
  */
object AdaptiveAgg {

  sealed trait Strategy { def label: String }
  case object ExpandPlan extends Strategy { val label = "expand" }
  case object PerFamily extends Strategy { val label = "per_family" }

  /** Pure decision function over the measured max-key statistic —
    * exposed separately so the spec can pin the flip point exactly.
    */
  def decide(maxKeyRows: Long, rowCap: Long): Strategy =
    if (maxKeyRows > rowCap) PerFamily else ExpandPlan

  /** Measure → decide → build: `fact.groupBy(key)` with
    * `count(*) AS n_rows`, one exact `count(DISTINCT c) AS n_<c>` per
    * distinct column, and `round(sum(CAST(valueCol AS DECIMAL(12,2))),
    * 2) AS sum_value`, through whichever shape the measured max-key
    * frequency picks. Returns the chosen strategy with the frame so
    * callers (and the plan gates) can see which shape the measurement
    * chose.
    */
  def adaptiveAgg(fact: DataFrame, key: String, distinctCols: Seq[String],
      valueCol: String, rowCap: Long): (Strategy, DataFrame) = {
    // the q_skew_profile statistic: one map-side-combined aggregate
    // reduced to a single driver row, memoized per (source, key) so
    // sibling adaptive operators on the same column share ONE scan
    // (graft.engine.AdaptiveStats)
    val maxKeyRows = graft.engine.AdaptiveStats.keyStats(fact, key)
      .maxKeyRows
    val strategy = decide(maxKeyRows, rowCap)
    (strategy, buildAgg(fact, key, distinctCols, valueCol, strategy))
  }

  /** The two aggregation shapes behind one result contract; public so
    * the forced-regime query and the plan gates address each directly.
    * Distinct columns surface as `n_<col>`, in `distinctCols` order.
    */
  def buildAgg(fact: DataFrame, key: String, distinctCols: Seq[String],
      valueCol: String, strategy: Strategy): DataFrame = {
    require(distinctCols.nonEmpty, "at least one distinct column")
    val dec = col(valueCol).cast("decimal(12,2)")
    strategy match {
      case ExpandPlan =>
        val aggs = (count(lit(1)).as("n_rows") +:
          distinctCols.map(c => countDistinct(col(c)).as(s"n_$c"))) :+
          round(sum(dec).cast("double"), 2).as("sum_value")
        fact.groupBy(key).agg(aggs.head, aggs.tail: _*)
      case PerFamily =>
        // family 1 carries the algebraic aggregates through its
        // two-level pass; each further family is its own column-pruned
        // dedup pass joined back on the (group-cardinality-sized) key.
        // NULL semantics must match ExpandPlan's exactly (advice-r15):
        // count(DISTINCT c) excludes NULL values, so level 2 counts
        // only non-NULL distinct-value groups — count(col(c)) — while
        // count(*) and sum still see every row of the NULL group.
        val head = fact
          .groupBy(col(key), col(distinctCols.head))
          .agg(count(lit(1)).as("__n"), sum(dec).as("__sum"))
          .groupBy(key).agg(
            sum(col("__n")).as("n_rows"),
            count(col(distinctCols.head)).as(s"n_${distinctCols.head}"),
            round(sum(col("__sum")).cast("double"), 2).as("sum_value"))
        // join-back is NULL-SAFE (<=>) and LEFT-anchored on the head
        // family: a NULL group key is a real group to count(*) and to
        // every count(DISTINCT), so an equality join would silently
        // drop it (advice-r15). Key sets are identical by construction
        // (both sides group the same fact by the same key), so LEFT
        // never manufactures NULL counts — it only pins the anchor.
        val joined = distinctCols.tail.foldLeft(head) { (acc, c) =>
          val fam = fact.groupBy(col(key), col(c))
            .agg(count(lit(1)).as("__x"))
            .groupBy(key).agg(count(col(c)).as(s"n_$c"))
            .withColumnRenamed(key, "__famkey")
          acc.join(broadcast(fam), col(key) <=> col("__famkey"), "left")
            .drop("__famkey")
        }
        // surface columns in the ExpandPlan order so both shapes share
        // one schema contract
        joined.select(col(key) +: (col("n_rows") +:
          distinctCols.map(c => col(s"n_$c")) :+ col("sum_value")): _*)
    }
  }
}
