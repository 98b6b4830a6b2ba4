package graft

import org.apache.spark.sql.functions._
import graft.engine.Dedup

/** Deep-graph guarantees for the connected-components pass behind
  * `q_dedup_clusters`: the fixture dup clusters are 2–3 nodes, so the
  * oracle check never exercises depth — these tests do. Pointer halving
  * must deliver O(log n) rounds on a path graph (the worst-case diameter
  * shape); plain one-hop propagation would need ~diameter rounds.
  */
class ClusteringSpec extends SparkSpec {

  test("1000-node path graph converges in O(log n) rounds to one root") {
    val pairs = spark.range(999)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // threshold 0 forces the DISTRIBUTED loop (the small-graph driver
    // path would solve this in one collect)
    val (labels, rounds) = Dedup.clusterPairs(pairs, 0L)
    // o(k) = 2*o(k-1) + 2 → offset 2^(k+1)-2 covers 999 hops at k=9;
    // allow slack for the final no-change confirmation round
    assert(rounds <= 12, s"path graph took $rounds rounds (need O(log n))")
    assert(labels.count() === 1000)
    val roots = labels.select("component_root").distinct().collect()
    assert(roots.map(_.getLong(0)).toSeq === Seq(0L))
    assert(labels.filter(col("keep")).count() === 1)
  }

  test("convergence rides the observed metric — no per-round count job") {
    // The changed-rows metric must ride the round's materialization
    // (observe + localCheckpoint), not a separate count() action. AQE
    // and broadcast exchanges legitimately split one query into several
    // jobs, so a raw job-count bound is meaningless; the gate counts
    // jobs whose CALLSITE is a count() inside Dedup. Exactly ONE is
    // legitimate — the edge-sizing count at loop setup. The old
    // per-round convergence regime fires `rounds` more; the defensive
    // observation-timeout fallback would too. Neither may fire on a
    // healthy multi-round run.
    val dedupCountJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(
          j.properties.getProperty("callSite.short")).getOrElse("")
        if (site.startsWith("count at Dedup"))
          dedupCountJobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val pairs = spark.range(255)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val (labels, rounds) = Dedup.clusterPairs(pairs, 0L)
      assert(labels.count() === 256)
      assert(rounds >= 2, s"want a multi-round run, got $rounds")
      // the listener bus is async — give queued job-start events a
      // moment to drain before reading
      Thread.sleep(1000)
      val n = dedupCountJobs.get()
      assert(n <= 1,
        s"$n count-at-Dedup jobs over $rounds rounds — convergence is " +
          "running a per-round count action instead of the observed metric")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("disjoint components keep distinct roots and one keeper each") {
    val a = spark.range(99)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val b = spark.range(500, 599)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // default threshold: this run exercises the driver union-find path
    val (labels, _) = Dedup.clusterPairs(a.union(b))
    val roots = labels.select("component_root").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(roots === Set(0L, 500L))
    assert(labels.filter(col("keep")).count() === 2)
    // every node labels to its component's minimum
    assert(labels.filter(col("doc_id") < 500 &&
      col("component_root") =!= 0L).count() === 0)
  }

  test("driver union-find equals the distributed loop on random graphs") {
    // the size dispatch must be invisible: same (node, component min,
    // keeper) labels from both paths on arbitrary edge sets
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { trial =>
      val n = 40 + trial * 30
      val edges = Seq.fill(n)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      import spark.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val fast = Dedup.clusterPairs(pairs)._1.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      val dist = Dedup.clusterPairs(pairs, 0L)._1.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      assert(fast.toSeq === dist.toSeq, s"trial $trial diverged")
    }
  }

  test("banding design: (bands=4, rows=3) maximizes the S-curve" +
      " separation among 12-permutation factorizations") {
    // P(candidate | jaccard = j/100) = 1 - (1 - t^r)^b, computed EXACTLY
    // as a big rational in ppm: the numerator is
    // 100^(r·b) - (100^r - j^r)^b over denominator 100^(r·b).
    def pPpm(b: Int, r: Int, jPct: Int): Long = {
      val den = BigInt(100).pow(r * b)
      val num = den - (BigInt(100).pow(r) - BigInt(jPct).pow(r)).pow(b)
      (num * 1000000 / den).toLong
    }
    val factorizations = Seq((12, 1), (6, 2), (4, 3), (3, 4), (2, 6),
      (1, 12))
    assert(factorizations.forall { case (b, r) =>
      b * r == Dedup.Bands * Dedup.Rows
    })
    // the house threshold is 0.6; the design wants candidates LIKELY at
    // the threshold and UNLIKELY well below it — measure the separation
    // P(60) − P(30) per factorization
    def gap(b: Int, r: Int): Long = pPpm(b, r, 60) - pPpm(b, r, 30)
    val houseGap = gap(Dedup.Bands, Dedup.Rows)
    factorizations.filterNot(_ == ((Dedup.Bands, Dedup.Rows)))
      .foreach { case (b, r) =>
        assert(houseGap > gap(b, r),
          s"factorization ($b,$r) separates better than the house choice")
      }
    // the house curve's anchor points: 62.2% recall at the threshold,
    // 10.4% at 0.3, 94.3% at 0.8 (the signature/star fallbacks own the
    // band-missed tail — see lshCandidates)
    assert(pPpm(4, 3, 60) === 622198L)
    assert(pPpm(4, 3, 30) === 103704L)
    assert(pPpm(4, 3, 80) === 943287L)
    // monotone in jaccard for the house curve
    (1 until 100).foreach { j =>
      assert(pPpm(4, 3, j) <= pPpm(4, 3, j + 1))
    }
  }

  test("index forget: patch invariants and accounting row consistency") {
    val patched = Dedup.forgetPatchedRows(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    // no deleted doc survives anywhere in the patched index — member
    // rows and star rows alike (a star doc is itself a bucket member)
    patched.foreach { case (band, bkey, docB, _) =>
      assert(docB % Dedup.ForgetMod != 0L,
        s"deleted doc $docB survives in bucket ($band,$bkey)")
    }
    // clean and rebuilt rows partition the bucket-key space: a bucket
    // is either untouched (clean) or dirty (rebuilt), never both
    val cleanKeys = patched.filter(_._4).map(p => (p._1, p._2)).toSet
    val rebuiltKeys = patched.filterNot(_._4).map(p => (p._1, p._2)).toSet
    assert(cleanKeys.intersect(rebuiltKeys).isEmpty,
      "a bucket appears in both the clean pass-through and the rebuild")
    // the accounting row must be the exact fold of the patched rows
    val out = Dedup.indexForget(spark, sf).head
    def poly(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) =>
        (acc * 31 + (b & 0xff)) % Dedup.IdMod)
    val fp = patched.map { case (band, bkey, docB, _) =>
      BigInt(poly(s"$band:$bkey:$docB"))
    }.sum % Dedup.IdMod
    assert(out.getAs[Long]("n_clean_rows") === patched.count(_._4).toLong)
    assert(out.getAs[Long]("n_rebuilt_rows") ===
      patched.count(!_._4).toLong)
    assert(out.getAs[Long]("n_rows_after") === patched.length.toLong)
    assert(out.getAs[Long]("fp_after") === fp.toLong)
    // the fixture's forget batch is non-empty and touches buckets
    assert(out.getAs[Long]("n_deleted_docs") > 0L)
    assert(out.getAs[Long]("n_dirty_buckets") > 0L)
    assert(out.getAs[Long]("n_rows_before") >=
      out.getAs[Long]("n_rows_after"))
  }

  test("index forget: the patch is a fixed point — re-applying the same" +
      " deletion batch changes nothing") {
    import spark.implicits._
    val corpus = Seq(
      (10L, 0, "A"), (11L, 0, "A"), (12L, 0, "A"),
      (20L, 0, "B"), (21L, 0, "B"), (22L, 0, "B"), (23L, 0, "B"),
      (5L, 1, "C"), (6L, 1, "C"),
      (30L, 1, "D"), (31L, 1, "D"), (32L, 1, "D"), (33L, 1, "D"))
      .toDF("doc_id", "band", "bkey")
    val idx = Seq(
      (0, "A", 10L), (0, "B", 20L),
      (1, "C", 5L), (1, "C", 6L), (1, "D", 30L))
      .toDF("band", "bkey", "doc_b")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("band", "bkey", "doc_b").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted
    val once = Dedup.forgetPatch(idx, corpus, 10L, 2)
    // feed the PATCHED index back in with the same deletion batch: the
    // deleted docs' band rows still mark the same buckets dirty, and
    // rebuilding them from the same retained members must reproduce the
    // patch exactly — deletion application is idempotent
    val twice = Dedup.forgetPatch(
      once.select("band", "bkey", "doc_b"), corpus, 10L, 2)
    assert(rows(once).toSeq === rows(twice).toSeq)
  }

  test("index forget: star buckets re-expand, re-key, and stay collapsed" +
      " exactly per the cap rule") {
    import spark.implicits._
    // synthetic corpus band rows at cap=2; forgetMod=10 deletes 10,20,30
    //  bucket A: members 10,11,12 (size 3 > cap → index holds star 10);
    //    deleting 10 leaves {11,12} = cap → must RE-EXPAND to members
    //  bucket B: members 20,21,22,23 (star 20); deleting 20 leaves
    //    {21,22,23} > cap → stays collapsed but must RE-KEY star to 21
    //  bucket C: members 5,6 (sub-cap member rows); no deletions → must
    //    pass through untouched as clean rows
    //  bucket D: members 30,31,32,33 (star 30) — like B, re-keys to 31
    val corpus = Seq(
      (10L, 0, "A"), (11L, 0, "A"), (12L, 0, "A"),
      (20L, 0, "B"), (21L, 0, "B"), (22L, 0, "B"), (23L, 0, "B"),
      (5L, 1, "C"), (6L, 1, "C"),
      (30L, 1, "D"), (31L, 1, "D"), (32L, 1, "D"), (33L, 1, "D"))
      .toDF("doc_id", "band", "bkey")
    // the standing index = the build-time collapse at cap=2
    val idx = Seq(
      (0, "A", 10L), (0, "B", 20L),
      (1, "C", 5L), (1, "C", 6L), (1, "D", 30L))
      .toDF("band", "bkey", "doc_b")
    val rows = Dedup.forgetPatch(idx, corpus, 10L, 2).collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        (r.getLong(2), r.getBoolean(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    assert(rows((0, "A")) === Seq((11L, false), (12L, false)),
      "oversize bucket dropping to cap must re-expand to member rows")
    assert(rows((0, "B")) === Seq((21L, false)),
      "still-oversize bucket must re-key its star to the new min")
    assert(rows((1, "C")) === Seq((5L, true), (6L, true)),
      "untouched bucket must pass through as clean rows")
    assert(rows((1, "D")) === Seq((31L, false)))
  }
}
