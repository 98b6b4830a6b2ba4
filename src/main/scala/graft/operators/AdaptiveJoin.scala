package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diagnostics-driven join strategy selection — the loop that closes the
  * gap between MEASURING (the `q_join_size_estimate` /`q_skew_profile`
  * diagnostics) and PLANNING: the same two statistics those queries
  * report are consumed here to pick the physical join shape, instead of
  * leaving the choice to a human reading a dashboard.
  *
  * Decision rule, in preference order:
  *   1. dim fits the broadcast budget → BROADCAST hash join. Cheapest
  *      shape AND immune to fact-side skew (no fact shuffle at all), so
  *      a small dim short-circuits the skew probe entirely — one
  *      diagnostic pass saved.
  *   2. dim too big, fact has a key over the row cap (the
  *      `q_skew_profile` max-key statistic) → SALTED sort-merge join via
  *      [[SkewJoin.profiledSaltedJoin]]: hot keys fan out to bound every
  *      reducer at the cap.
  *   3. otherwise → plain SORT-MERGE join (explicit `merge` hint: the
  *      decision was made from measurements, don't let a stale
  *      autoBroadcast estimate second-guess it).
  *
  * Strategy is result-invariant by construction (all three shapes
  * compute the same relational join), which is exactly what makes the
  * consuming query oracle-checkable: the DuckDB oracle is the plain
  * join, whatever shape was chosen — the `q_salted_join` pattern.
  *
  * 100 TB shape: the two diagnostics are one metadata-cheap dim count
  * (production would read catalog/AQE statistics; the count here is the
  * engine-checkable stand-in) and one map-side-combined fact key
  * aggregate reduced to a single max row — both driver-bounded at one
  * row, both prunable (the skew probe only runs when the dim is big).
  * The decision is a deterministic function of the measured data, so
  * retries replan identically.
  */
object AdaptiveJoin {

  sealed trait Strategy { def label: String }
  case object BroadcastDim extends Strategy { val label = "broadcast" }
  case object SaltedMerge extends Strategy { val label = "salted" }
  case object SortMerge extends Strategy { val label = "sort_merge" }

  /** Broadcast budget in DIM ROWS (the diagnostics are row-denominated;
    * a deployment divides its byte budget by the dim's avg row width).
    * 500k rows ≈ tens of MB for dimension-shaped rows — the
    * autoBroadcastJoinThreshold regime.
    */
  val BroadcastMaxRows = 500000L

  /** Pure decision function over the two measured statistics — exposed
    * separately so the spec can pin the flip points exactly.
    */
  def decide(dimRows: Long, factMaxKeyRows: Long, rowCap: Long,
      broadcastMaxRows: Long = BroadcastMaxRows): Strategy =
    if (dimRows <= broadcastMaxRows) BroadcastDim
    else if (factMaxKeyRows > rowCap) SaltedMerge
    else SortMerge

  /** Measure → decide → build. Returns the chosen strategy with the
    * joined frame so callers (and the spec's plan gates) can see which
    * shape the measurements picked.
    */
  def adaptiveJoin(fact: DataFrame, dim: DataFrame, key: String,
      rowCap: Long, spread: Column,
      broadcastMaxRows: Long = BroadcastMaxRows): (Strategy, DataFrame) = {
    val dimRows = dim.count()
    // skew probe only when it can change the decision (big dim):
    // one map-side-combined aggregate reduced to a single driver row
    val factMax =
      if (dimRows <= broadcastMaxRows) 0L
      else fact.groupBy(key).agg(count(lit(1)).as("__n"))
        .agg(max(col("__n"))).head().getLong(0)
    val strategy = decide(dimRows, factMax, rowCap, broadcastMaxRows)
    val joined = strategy match {
      case BroadcastDim => fact.join(broadcast(dim), Seq(key))
      case SaltedMerge =>
        // hint the join's immediate child — a hint buried under the salt
        // explode does not survive resolution to the (key, __salt) join
        val (saltedFact, saltedDim) =
          SkewJoin.profiledSaltParts(fact, dim, key, rowCap, spread)
        saltedFact.join(saltedDim.hint("merge"), Seq(key, "__salt"))
          .drop("__salt")
      case SortMerge => fact.join(dim.hint("merge"), Seq(key))
    }
    (strategy, joined)
  }
}
