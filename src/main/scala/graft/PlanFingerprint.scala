package graft

import org.apache.spark.sql.DataFrame

/** Normalized physical-plan fingerprints (VERDICT r15 #1): the operator
  * MULTISET of a query's executed plan — exchange counts by partitioning
  * kind, join strategies, Expand/Window/TakeOrderedAndProject presence,
  * aggregate flavors — with names, ids, partition counts and expression
  * text stripped. Time has a standing gate (SCALE_GATE), materialized
  * cost has one (BENCH_MATERIALIZED); this is the SHAPE gate: a Spark
  * upgrade or an innocent refactor that demotes a broadcast to a
  * shuffle, adds an Exchange, or resurrects an Expand flips the
  * fingerprint and fails [[PlanGate]] before it ever shows up as time.
  *
  * The whitelist is deliberately the SCALE-RELEVANT subset: Project/
  * Filter/scan nodes churn with harmless refactors and carry no shuffle
  * cost, while every listed operator either moves data (exchanges,
  * joins), replicates rows (Expand, Generate), or bounds a sort
  * (Window, TakeOrderedAndProject, WindowGroupLimit). InMemoryTableScan
  * is excluded on purpose — whether a memoized subtree is cache-backed
  * depends on session history, not on the plan the query declares.
  */
object PlanFingerprint {

  /** Operator head → fingerprint key; `Exchange` is split by
    * partitioning kind (hash/range/single — a range→hash flip is a
    * real shape change even at equal counts).
    */
  private val Heads: Set[String] = Set(
    "BroadcastExchange", "ReusedExchange",
    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "Expand", "Generate", "Window", "WindowGroupLimit",
    "TakeOrderedAndProject", "GlobalLimit",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate",
    "SortMergeJoin(skew=true)")

  /** Fingerprint one frame's executed plan (AQE initial plan when
    * adaptive — computed at PLANNING time, deterministic for a given
    * session config + data scale).
    */
  def fingerprint(df: DataFrame): Map[String, Int] =
    fromPlanString(df.queryExecution.executedPlan.toString)

  /** Parse a plan tree string into the operator multiset — exposed for
    * the spec's synthetic-plan tests.
    */
  def fromPlanString(plan: String): Map[String, Int] = {
    val keys = plan.split('\n').flatMap { raw =>
      // strip tree art (`+-`, `:-`, `:  `) and codegen stars `*(n) `
      val line = raw.dropWhile(c => c == ' ' || c == '+' || c == '-' ||
        c == ':').replaceFirst("""^\*\(\d+\) """, "")
      val head = line.takeWhile(c => c.isLetterOrDigit).mkString
      if (head == "Exchange") {
        val kind =
          if (line.contains("hashpartitioning")) "hash"
          else if (line.contains("rangepartitioning")) "range"
          else if (line.contains("SinglePartition")) "single"
          else "other"
        Some(s"Exchange:$kind")
      } else if (head == "Sort") {
        // only GLOBAL sorts are shape-relevant (an extra exchange
        // would already be counted; local sorts ride requirements)
        if (line.contains(", true,")) Some("Sort:global") else None
      } else if (Heads.contains(head)) Some(head)
      else None
    }
    keys.groupBy(identity).map { case (k, v) => k -> v.length }
  }

  /** Render a fingerprint as a stable, diff-reviewable JSON object. */
  def toJson(fp: Map[String, Int]): String =
    fp.toSeq.sorted.map { case (k, n) => s""""$k":$n""" }
      .mkString("{", ",", "}")
}
