package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** The standing plan-shape gate's own contract (VERDICT r15 #1): the
  * fingerprint parser, the pure drift/coverage predicates, a LIVE
  * gate-red demo (a broadcast join demoted to sort-merge must trip),
  * and artifact completeness over the full query surface.
  */
class PlanGateSpec extends SparkSpec {

  test("fingerprint parser: operator multiset, ids and counts stripped") {
    val plan =
      """AdaptiveSparkPlan isFinalPlan=false
        |+- Project [a#1L, b#2]
        |   +- BroadcastHashJoin [a#1L], [c#3L], Inner, BuildRight, false
        |      :- Filter isnotnull(a#1L)
        |      :  +- Exchange hashpartitioning(a#1L, 32), ENSURE_REQUIREMENTS, [plan_id=7]
        |      :     +- *(2) HashAggregate(keys=[a#1L], functions=[count(1)])
        |      :        +- Exchange hashpartitioning(a#1L, 32), REPARTITION, [plan_id=5]
        |      :           +- FileScan parquet [a#1L]
        |      +- BroadcastExchange HashedRelationBroadcastMode(...), [plan_id=9]
        |         +- Sort [c#3L ASC NULLS FIRST], true, 0
        |            +- Exchange rangepartitioning(c#3L ASC, 32), [plan_id=3]
        |               +- Expand [List(c#3L, null), List(null, d#4L)]
        |                  +- Window [row_number() ...], [c#3L]
        |                     +- Exchange SinglePartition, [plan_id=1]
        |                        +- FileScan parquet [c#3L]""".stripMargin
    val fp = PlanFingerprint.fromPlanString(plan)
    assert(fp === Map(
      "BroadcastHashJoin" -> 1, "Exchange:hash" -> 2,
      "Exchange:range" -> 1, "Exchange:single" -> 1,
      "BroadcastExchange" -> 1, "HashAggregate" -> 1,
      "Expand" -> 1, "Window" -> 1, "Sort:global" -> 1))
    // Project / Filter / FileScan / AdaptiveSparkPlan are deliberately
    // NOT in the fingerprint; local sorts (flag false) neither
    assert(!fp.contains("Project") && !fp.contains("Sort"))
  }

  test("pure predicates: drift reports the operator delta; coverage " +
      "flags uncommitted queries") {
    val committed = Map(
      "q_a" -> Map("BroadcastHashJoin" -> 1, "Exchange:hash" -> 1),
      "q_b" -> Map("HashAggregate" -> 2))
    val same = PlanGate.offenders(committed, committed)
    assert(same.isEmpty)
    val drifted = Map(
      "q_a" -> Map("SortMergeJoin" -> 1, "Exchange:hash" -> 3),
      "q_b" -> Map("HashAggregate" -> 2))
    val off = PlanGate.offenders(committed, drifted)
    assert(off.map(_._1) === Seq("q_a"))
    assert(off.head._2 ===
      "BroadcastHashJoin 1->0, Exchange:hash 1->3, SortMergeJoin 0->1")
    assert(PlanGate.uncovered(committed,
      drifted + ("q_new" -> Map.empty[String, Int])) === Seq("q_new"))
    // a query that failed to plan carries the error marker and always
    // drifts from any committed clean shape
    assert(PlanGate.offenders(committed,
      Map("q_a" -> Map("!error" -> 1))).nonEmpty)
  }

  test("gate-red demo: demoting a broadcast to sort-merge trips the " +
      "gate") {
    // the drift class the gate exists for: an auto-broadcast decision
    // silently lost (threshold change, stats regression, Spark
    // upgrade). Same query, two thresholds — the fingerprints MUST
    // differ and offenders() must flag it.
    val dim = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"))
    val fact = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
    def fp(): Map[String, Int] = PlanFingerprint.fingerprint(
      fact.join(dim, fact("c_nationkey") === dim("n_nationkey")))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val healthy = fp()
    assert(healthy.contains("BroadcastHashJoin"),
      s"fixture join should auto-broadcast: $healthy")
    val demoted = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      fp()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(demoted.contains("SortMergeJoin") &&
      !demoted.contains("BroadcastHashJoin"),
      s"threshold -1 should demote to SMJ: $demoted")
    val off = PlanGate.offenders(
      Map("q_demo" -> healthy), Map("q_demo" -> demoted))
    assert(off.map(_._1) === Seq("q_demo"), "gate must trip on the demotion")
    assert(off.head._2.contains("BroadcastHashJoin 1->0") &&
      off.head._2.contains("SortMergeJoin 0->1"), off.head._2)
  }

  test("committed PLAN_GATE.json covers every SparkEntry query at the " +
      "gate scale") {
    // the standing gate is only standing if the artifact is complete:
    // a new query without a committed fingerprint fails HERE, not
    // silently-vacuously at gate time (ScaleGateSpec's discipline)
    val committed = PlanGate.readCommitted(PlanGate.DefaultPath, "sf0.01")
    val missing = SparkEntry.queries.keySet -- committed.keySet
    assert(missing.isEmpty,
      s"queries without committed fingerprints: ${missing.toSeq.sorted}")
    // and no error markers were ever committed
    val errs = committed.filter(_._2.contains("!error")).keys
    assert(errs.isEmpty, s"committed error fingerprints: $errs")
  }
}
