package graft

import org.apache.spark.sql.functions._
import graft.engine.{Dedup, JoinOps, Tables}

/** Join-reduction and view-maintenance invariants: the Bloom pre-filter is
  * sound (superset of true matches) and actually reduces the probe side;
  * the optimized paths are answer-invariant (bloom ≡ plain join, merged
  * MV partials ≡ full recompute); semi+anti partition the customer dim.
  */
class JoinOpsSpec extends SparkSpec {

  test("bloom pre-filter is sound and reduces the probe side") {
    val (total, passed, exact) = JoinOps.bloomProbeCounts(spark, sf)
    assert(exact <= passed, "bloom must never drop a true match")
    assert(passed <= total)
    // urgent orders are ~1/5 of the fixture; 2-hash/64Kbit bloom fp rate
    // is <1%, so the pass set must be well under half the probe side
    assert(passed < total / 2,
      s"bloom kept $passed of $total rows — no reduction happened")
  }

  test("bloom join result is bitmap-invariant (equals the plain join)") {
    val got = JoinOps.bloomJoin(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val want = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity").cast("decimal(12,2)")).cast("double"), 2)
          .as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(12,2)"))
          .cast("double"), 2).as("sum_price"))
      .collect()
    assert(got.map(_.toSeq).toSet == want.map(_.toSeq).toSet)
  }

  test("mv refresh merge-of-partials equals full recompute") {
    val got = JoinOps.mvRefresh(spark, sf).collect()
    val want = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).cast("long").as("n"),
        round(sum(col("l_quantity").cast("decimal(12,2)")).cast("double"), 2)
          .as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(12,2)"))
          .cast("double") / count(lit(1)), 4).as("avg_price"))
      .collect()
    assert(got.map(_.toSeq).toSet == want.map(_.toSeq).toSet)
    // second refresh reads the memoized persisted state — same answer
    val again = JoinOps.mvRefresh(spark, sf).collect()
    assert(again.map(_.toSeq).toSet == want.map(_.toSeq).toSet)
  }

  test("semi and anti counts partition each nation's customers") {
    val perNation = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
    val got = JoinOps.semiAnti(spark, sf)
      .join(perNation, "n_name")
      .filter(col("n_active") + col("n_inactive") =!= col("n_customers"))
    assert(got.count() == 0,
      "semi + anti must partition the customer set per nation")
    assert(JoinOps.semiAnti(spark, sf).agg(sum(col("n_active")))
      .head.getLong(0) > 0)
  }

  test("join size estimate: exact side is the true cardinality and the" +
      " sampled estimator replays exactly") {
    val r = JoinOps.joinSizeEstimate(spark, sf).head
    // the exact side IS the join cardinality
    val truth = Tables.orders(spark, sf).select(col("o_orderkey"))
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(r.getAs[Long]("exact_rows") === truth)
    // driver replay of the deterministic key sample
    def poly(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) =>
        (acc * 31 + (b & 0xff)) % Dedup.IdMod)
    val fa = Tables.orders(spark, sf).groupBy("o_orderkey")
      .agg(count(lit(1)).as("f")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val fb = Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(count(lit(1)).as("f")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val keys = fa.keySet.intersect(fb.keySet)
    def prod(k: Long): BigInt = BigInt(fa(k)) * fb(k)
    val heavy = keys.filter(k => prod(k) >= JoinOps.JoinEstHeavyMin)
    val sampledLight = (keys -- heavy).filter(k =>
      poly(k.toString) % JoinOps.JoinEstRate == 0L)
    assert(r.getAs[Long]("n_join_keys") === keys.size.toLong)
    assert(r.getAs[Long]("n_heavy_keys") === heavy.size.toLong)
    assert(r.getAs[Long]("sampled_keys") === sampledLight.size.toLong)
    val est = heavy.toSeq.map(prod).sum +
      sampledLight.toSeq.map(prod).sum * JoinOps.JoinEstRate
    assert(r.getAs[Long]("est_rows") === est.toLong)
    // the estimator must be in the right ballpark on the fixture
    // (uniform-ish key frequencies: well under 2x off)
    assert(r.getAs[Long]("err_ppm") < 500000L,
      s"estimate off by ${r.getAs[Long]("err_ppm")} ppm")
  }

  test("join size estimate: the heavy-hitter floor catches skew the" +
      " sample misses") {
    import spark.implicits._
    def poly(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) =>
        (acc * 31 + (b & 0xff)) % Dedup.IdMod)
    // a hot key OUTSIDE the 1/16 sample with a million-row product —
    // the case a pure sample misses by 10^6 rows
    val hot = (1L to 100L)
      .find(k => poly(k.toString) % JoinOps.JoinEstRate != 0L).get
    // light keys: f_a = f_b = 1 (product 1, all under the heavy floor)
    val lightKeys = (1000L to 1999L)
    val fa = (lightKeys.map(k => (k, 1L)) :+ ((hot, 1000L)))
      .toDF("k", "f")
    val fb = (lightKeys.map(k => (k, 1L)) :+ ((hot, 1000L)))
      .toDF("k", "f")
    val r = JoinOps.joinSizeEstimateCore(fa, fb).head
    val exact = 1000L + 1000000L
    assert(r.getAs[Long]("exact_rows") === exact)
    assert(r.getAs[Long]("n_heavy_keys") === 1L)
    // the hot key contributes EXACTLY; only the light tail is sampled
    val sampledLight = lightKeys.count(k =>
      poly(k.toString) % JoinOps.JoinEstRate == 0L)
    val est = 1000000L + sampledLight * JoinOps.JoinEstRate
    assert(r.getAs[Long]("est_rows") === est)
    // without the floor the estimate would be the light tail alone
    // (hot key unsampled): off by ~10^6; with it the error is the
    // light tail's sampling noise only
    assert(math.abs(est - exact) < 500L,
      s"heavy floor failed: est $est vs exact $exact")
  }

  test("adaptive join: measured inputs flip the strategy; every regime" +
      " answers the plain join") {
    import spark.implicits._
    import graft.operators.AdaptiveJoin
    import graft.operators.AdaptiveJoin._
    // decide() flip points are exact functions of the two measurements,
    // byte-denominated on the broadcast side (VERDICT r14 #3)
    assert(decide(dimBytes = 10, factMaxKeyRows = 0, rowCap = 32,
      broadcastMaxBytes = 10) === BroadcastDim)
    assert(decide(11, 33, 32, 10) === SaltedMerge)
    assert(decide(11, 32, 32, 10) === SortMerge)
    // the sampled width estimate sees actual string payloads: a frame
    // of 8-byte longs + ~1000-byte strings must measure ~1000x wider
    // than a long-only frame, so a 500k-row wide dim correctly blows a
    // budget its row count alone would have passed (the r14 advice
    // scenario)
    val narrow = AdaptiveJoin.sampledAvgRowBytes(
      spark.range(100).toDF("id"), 100L)
    val wide = AdaptiveJoin.sampledAvgRowBytes(
      spark.range(100).select(col("id"),
        concat_ws("", (1 to 250).map(_ => lit("abcd")): _*).as("s")),
      100L)
    assert(narrow >= 8.0 && narrow < 32.0, s"narrow width $narrow")
    assert(wide > 1000.0 && wide < 1100.0, s"wide width $wide")
    // fixture regime: part is measured under the broadcast budget ->
    // BroadcastDim, and the executed plan carries the broadcast join
    val fact = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"))
    val dim = Tables.part(spark, sf)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val (s0, j0) = AdaptiveJoin.adaptiveJoin(fact, dim, "l_partkey",
      32L, col("l_orderkey"))
    assert(s0 === BroadcastDim)
    assert(j0.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "broadcast regime plan gate")
    // synthetic regimes: shrink the broadcast budget so the same-size
    // frames cross it, and control skew via one hot key
    val hotFact = ((1 to 640).map(i => (1L, i.toLong)) ++
      (2L to 200L).map(k => (k, k))).toDF("k", "spread")
    val coldFact = (1L to 800L).map(k => (k, k)).toDF("k", "spread")
    val bigDim = (1L to 200L).map(k => (k, s"v$k")).toDF("k", "attr")
    val (s1, j1) = AdaptiveJoin.adaptiveJoin(hotFact, bigDim, "k", 32L,
      col("spread"), broadcastMaxBytes = 10L)
    assert(s1 === SaltedMerge)
    val p1 = j1.queryExecution.executedPlan.toString
    assert(p1.contains("SortMergeJoin") && p1.contains("__salt"),
      s"salted regime plan gate:\n$p1")
    val (s2, j2) = AdaptiveJoin.adaptiveJoin(coldFact, bigDim, "k", 32L,
      col("spread"), broadcastMaxBytes = 10L)
    assert(s2 === SortMerge)
    val p2 = j2.queryExecution.executedPlan.toString
    assert(p2.contains("SortMergeJoin") && !p2.contains("__salt"),
      s"sort-merge regime plan gate:\n$p2")
    // strategy invariance: each regime equals the plain join
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "spread", "attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(canon(j1) === canon(hotFact.join(bigDim, Seq("k"))))
    assert(canon(j2) === canon(coldFact.join(bigDim, Seq("k"))))
  }

  test("adaptive agg: the Expand plan measurably ships more shuffle " +
      "bytes than per-family") {
    // the operator's whole justification is wire volume: Catalyst's
    // multi-distinct Expand replicates every input row once per
    // aggregate family through the first exchange. Measure it — run
    // both shapes AQE-off and sum each executed plan's exchange
    // dataSize metrics; the Expand plan must ship strictly more.
    import graft.operators.AdaptiveAgg
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevA = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val fact = Tables.events(spark, sf)
        .select(col("event_type"), col("user_id"),
          to_date(col("ts")).as("day"), col("value"))
      def shuffledBytes(df: org.apache.spark.sql.DataFrame): Long = {
        // drive THIS QueryExecution's plan (count() would build and
        // execute a separate one, leaving these metrics untouched)
        df.queryExecution.toRdd.foreach(_ => ())
        df.queryExecution.executedPlan.collect {
          case s: ShuffleExchangeExec => s.metrics("dataSize").value
        }.sum
      }
      val expand = shuffledBytes(AdaptiveAgg.buildAgg(fact, "event_type",
        Seq("user_id", "day"), "value", AdaptiveAgg.ExpandPlan))
      val perFam = shuffledBytes(AdaptiveAgg.buildAgg(fact, "event_type",
        Seq("user_id", "day"), "value", AdaptiveAgg.PerFamily))
      info(s"expand shuffled $expand bytes, per-family $perFam bytes")
      assert(expand > perFam,
        s"Expand ($expand B) should out-ship per-family ($perFam B)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("adaptive window: measured max-key flips; range-prefix splits " +
      "the hot key across partitions and matches the plain window") {
    import spark.implicits._
    import graft.operators.AdaptiveWindow
    import graft.operators.AdaptiveWindow._
    assert(decide(maxKeyRows = 32, rowCap = 32) === PlainWindow)
    assert(decide(33, 32) === RangePrefix)
    // one dominant key (800 of 900 rows) with a unique order column
    val fact = ((1 to 800).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"cold${i % 10}", (1000 + i).toLong)))
      .toDF("k", "o")
    val (s1, r1) = AdaptiveWindow.adaptiveRank(fact, "k", Seq("o"),
      "rnk", 32L)
    assert(s1 === RangePrefix)
    val (s2, r2) = AdaptiveWindow.adaptiveRank(fact, "k", Seq("o"),
      "rnk", 100000L)
    assert(s2 === PlainWindow)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    assert(canon(r1) === canon(r2), "strategy invariance")
    // the whole point: the dominant key's rows must land in SEVERAL
    // __pid splits (no single task sorts the hot key). __pid is the
    // deterministic literal-boundary expression (advice-r15) — assert
    // directly on its value distribution: 800 hot rows against a
    // ~640-tuple sample target guarantees boundaries INSIDE the hot
    // key's (k, o) run.
    val hotSplit = fact.withColumn("p", graft.operators.AdaptiveWindow
        .splitId(fact, Seq(col("k"), col("o")), 900L))
      .filter(col("k") === "hot").select("p").distinct().count()
    assert(hotSplit >= 2,
      s"hot key confined to $hotSplit deterministic splits")
    // determinism is the correctness invariant the old range-exchange
    // shape LACKED: with exchange reuse disabled, the offsets subtree
    // and the probe side evaluate __pid independently — frozen literal
    // boundaries must still agree (the advice-r15 scenario)
    val prevReuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    try {
      spark.conf.set("spark.sql.exchange.reuse", "false")
      val (s3, r3) = AdaptiveWindow.adaptiveRank(fact, "k", Seq("o"),
        "rnk", 32L)
      assert(s3 === RangePrefix)
      assert(canon(r3) === canon(r2),
        "range-prefix ranks drifted with exchange reuse OFF")
    } finally spark.conf.set("spark.sql.exchange.reuse", prevReuse)
  }

  test("adaptive trilogy shares ONE diagnostic scan per (table, key)") {
    // VERDICT r15 #3: at 100 TB the max-key diagnostic is itself a
    // full-scan job; N adaptive operators on one (table, key) must not
    // pay N scans. AdaptiveStats counts each diagnostic computation
    // (each is exactly one Spark job — a single head()); two different
    // operators over DIFFERENTLY-PROJECTED views of the same source +
    // key must add exactly one.
    import spark.implicits._
    val base = (1 to 300).map(i =>
      (s"k${i % 9}", i.toLong, i * 2L, s"p$i")).toDF("k", "o", "v", "x")
    // different projections of the same source; same key column —
    // the canonical single-column memo key must unify them
    val viewA = base.select(col("k"), col("o"), col("v"))
    val viewB = base.select(col("k"), col("o"), col("x"))
    val before = graft.engine.AdaptiveStats.scans.get()
    val (_, rankDf) = graft.operators.AdaptiveWindow.adaptiveRank(
      viewA, "k", Seq("o"), "rnk", 1L)
    val (_, aggDf) = graft.operators.AdaptiveAgg.adaptiveAgg(
      viewB, "k", Seq("x"), "o", 1L)
    assert(rankDf.columns.contains("rnk") && aggDf.columns
      .contains("n_rows")) // both operators actually built
    val scans = graft.engine.AdaptiveStats.scans.get() - before
    assert(scans === 1L,
      s"$scans diagnostic scans for one (table, key) — " +
        "the trilogy is not sharing the memoized statistic")
  }

  test("adaptive agg: PerFamily matches ExpandPlan on NULL keys and " +
      "NULL distinct values") {
    // advice-r15: count(DISTINCT c) excludes NULLs and a NULL group
    // key is a real group — the hand-lowered shape must preserve both
    import spark.implicits._
    import graft.operators.AdaptiveAgg
    val fact = Seq[(Option[String], Option[Long], Option[Long], Double)](
      (Some("a"), Some(1L), Some(10L), 1.0),
      (Some("a"), None, Some(10L), 2.0),      // NULL distinct value
      (Some("a"), Some(2L), None, 3.0),
      (None, Some(1L), Some(20L), 4.0),       // NULL group key
      (None, None, None, 5.0),
      (Some("b"), None, None, 6.0))           // all-NULL distinct family
      .toDF("k", "u", "d", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).sortBy(_._1).toSeq
    val expand = canon(AdaptiveAgg.buildAgg(fact, "k", Seq("u", "d"),
      "v", AdaptiveAgg.ExpandPlan))
    val perFam = canon(AdaptiveAgg.buildAgg(fact, "k", Seq("u", "d"),
      "v", AdaptiveAgg.PerFamily))
    assert(perFam === expand, "NULL semantics diverge between shapes")
    // and the values are the ANSI ones: NULL key group counted, NULL
    // distinct values excluded
    assert(expand.find(_._1.isEmpty).get ===
      ((None, 2L, 1L, 1L, 9.0)))
    assert(expand.find(_._1.contains("a")).get ===
      ((Some("a"), 3L, 2L, 1L, 6.0)))
    assert(expand.find(_._1.contains("b")).get ===
      ((Some("b"), 1L, 0L, 0L, 6.0)))
  }

  test("adaptive join: optimizer-stats path and sampled path agree on " +
      "the fixture dims") {
    // VERDICT r15 #7: the production decision reads statistics, it
    // doesn't scan — but both estimators must land the same side of
    // the 32 MB budget on real dims, or the upgrade changed decisions
    import graft.operators.AdaptiveJoin
    for (dim <- Seq(
        Tables.part(spark, sf)
          .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        Tables.customer(spark, sf)
          .select(col("c_custkey"), col("c_mktsegment")))) {
      val statsBytes = AdaptiveJoin.dimBytes(dim)
      val n = dim.count()
      val sampled = (n * AdaptiveJoin.sampledAvgRowBytes(dim, n)).toLong
      assert(AdaptiveJoin.decide(statsBytes, 0L, 32L) ===
        AdaptiveJoin.decide(sampled, 0L, 32L),
        s"stats path ($statsBytes B) and sampled path ($sampled B) " +
          "disagree on the broadcast decision")
    }
  }

  test("adaptive agg: measured max-key flips the strategy; both shapes" +
      " answer the plain aggregate") {
    import spark.implicits._
    import graft.operators.AdaptiveAgg
    import graft.operators.AdaptiveAgg._
    // decide() flip point is exact: strictly over the cap hand-lowers
    assert(decide(maxKeyRows = 32, rowCap = 32) === ExpandPlan)
    assert(decide(33, 32) === PerFamily)
    // one hot key (640 rows) against a uniform tail; both distinct
    // payloads repeat so n_u/n_d < n_rows in the hot group
    val fact = ((1 to 640).map(i =>
      ("hot", (i % 7).toLong, (i % 3).toLong, 1.5)) ++
      (1 to 200).map(i => (s"cold$i", i.toLong, i.toLong, 2.0)))
      .toDF("k", "u", "d", "v")
    val (s1, a1) = AdaptiveAgg.adaptiveAgg(fact, "k", Seq("u", "d"),
      "v", 32L)
    assert(s1 === PerFamily)
    val (s2, a2) = AdaptiveAgg.adaptiveAgg(fact, "k", Seq("u", "d"),
      "v", 1000L)
    assert(s2 === ExpandPlan)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sorted.toSeq
    val plain = canon(a2)
    assert(canon(a1) === plain, "strategy invariance")
    assert(plain.find(_._1 == "hot").get ===
      (("hot", 640L, 7L, 3L, 960.0)))
  }
}
