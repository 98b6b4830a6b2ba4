package graft

import org.apache.spark.sql.functions._
import graft.engine.{Linkage, Tables}

/** Record-linkage / graph / index-build operators (Linkage.scala):
  * invariants the DuckDB hash-compare cannot express — pair symmetry and
  * cap behavior for fuzzy matching, rank-mass conservation for the
  * fixed-point PageRank, diff-class partition laws for the snapshot diff,
  * and postings boundedness for the inverted index.
  */
class LinkageSpec extends SparkSpec {
  test("fuzzy match: pairs are canonical, within-block, under threshold") {
    val m = Linkage.fuzzyMatch(spark, sf).cache()
    try {
      assert(m.count() > 0, "blocking should admit some candidate pairs")
      // canonical orientation — no (b,a) duplicate of any (a,b)
      assert(m.filter(col("a_id") >= col("b_id")).count() === 0)
      assert(m.filter(col("dist") > Linkage.FuzzyMaxDist ||
        col("dist") < 0).count() === 0)
      // every pair shares its blocking key (first token)
      val blk = Tables.documents(spark, sf)
        .select(col("doc_id"), split(col("text"), " ")
          .getItem(0).as("blk"))
      val joined = m.join(blk.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("blk", "a_blk"), "a_id")
        .join(blk.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("blk", "b_blk"), "b_id")
      assert(joined.filter(col("a_blk") =!= col("b_blk")).count() === 0)
    } finally m.unpersist()
  }

  test("fuzzy match: candidate volume is blocked, not all-pairs") {
    val n = Tables.documents(spark, sf).count()
    val pairs = Linkage.fuzzyMatch(spark, sf).count()
    // all-pairs would be n(n-1)/2; blocking must stay well under it,
    // bounded by sum over blocks of cap² ≪ n²
    assert(pairs < n * (n - 1) / 4,
      s"$pairs candidate pairs out of ${n * (n - 1) / 2} possible — " +
        "blocking is not bounding the pair space")
  }

  test("pagerank: ranks positive, keyed by every graph node, reproducible") {
    val r = Linkage.pageRank(spark, sf).cache()
    try {
      val nNodes = r.count()
      assert(nNodes > 0)
      assert(r.filter(col("pr") <= 0).count() === 0)
      // node set = both endpoints of the bipartite edge set
      val custs = r.filter(col("node").startsWith("c")).count()
      val supps = r.filter(col("node").startsWith("s")).count()
      assert(custs > 0 && supps > 0 && custs + supps === nNodes)
      // total rank mass stays near n·scale: damping redistributes 15%
      // uniformly and floor() only ever shaves, so the sum is bounded
      // above by n·scale and below by a few % of floor loss
      val mass = r.agg(sum("pr")).head.getLong(0)
      assert(mass <= nNodes * Linkage.PrScale)
      assert(mass > (nNodes * Linkage.PrScale * 9) / 10,
        s"rank mass $mass lost >10% of ${nNodes * Linkage.PrScale}")
      // deterministic: a second build hash-joins to zero diffs
      val r2 = Linkage.pageRank(spark, sf)
      assert(r.join(r2, Seq("node"))
        .filter(r("pr") =!= r2("pr")).count() === 0)
    } finally r.unpersist()
  }

  test("pagerank at 10 iterations: checkpointed loop completes and converges") {
    // iters > PrIters switches to the localCheckpoint-per-round regime
    // (lineage truncation); the run must complete with the same node set
    // as the unrolled 3-round query, strictly positive fixed-point ranks,
    // and byte-identical results across two independent builds — a
    // nondeterministic checkpoint or a lineage-dependent result would
    // break the reproducibility join.
    val r3 = Linkage.pageRank(spark, sf)
      .withColumnRenamed("pr", "pr3").cache()
    val r10 = Linkage.pageRankIter(spark, sf, 10).cache()
    try {
      assert(r10.count() === r3.count())
      assert(r10.join(r3, Seq("node"), "full")
        .filter(col("pr").isNull || col("pr3").isNull).count() === 0,
        "node sets diverge")
      // every rank ≥ the damping floor 0.15·scale
      assert(r10.filter(col("pr") < (Linkage.PrScale * 15) / 100)
        .count() === 0)
      // more rounds actually moved the fixed point somewhere
      assert(r10.join(r3, Seq("node"))
        .filter(col("pr") =!= col("pr3")).count() > 0,
        "10 rounds produced exactly the 3-round ranks")
      val again = Linkage.pageRankIter(spark, sf, 10)
      assert(r10.join(again.withColumnRenamed("pr", "prb"), Seq("node"))
        .filter(col("pr") =!= col("prb")).count() === 0,
        "checkpointed loop is not deterministic")
    } finally { r3.unpersist(); r10.unpersist() }
  }

  test("snapshot diff: classes partition the id space by the carve rule") {
    val d = Linkage.snapshotDiff(spark, sf).cache()
    try {
      // exactly one row per doc_id present in either snapshot
      assert(d.groupBy("doc_id").count().filter(col("count") > 1)
        .count() === 0)
      val byClass = d.groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(Set("added", "removed", "changed", "unchanged")
        .subsetOf(byClass.keySet))
      // carve rules are exact arithmetic on doc_id: added ⟺ id%7=0
      // (absent from prev) while id%11≠0; removed ⟺ id%11=0 while
      // id%7≠0; changed ⟺ id%10=0 in both snapshots
      val ids = Tables.documents(spark, sf)
        .select(col("doc_id")).collect().map(_.getLong(0))
      def expect(p: Long => Boolean) = ids.count(p).toLong
      assert(byClass("added") ===
        expect(i => i % 7 == 0 && i % 11 != 0))
      assert(byClass("removed") ===
        expect(i => i % 11 == 0 && i % 7 != 0))
      assert(byClass("changed") ===
        expect(i => i % 10 == 0 && i % 7 != 0 && i % 11 != 0))
      // removed rows carry no current fingerprint; all others do
      assert(d.filter(col("status") === "removed" &&
        col("cur_fp").isNotNull).count() === 0)
      assert(d.filter(col("status") =!= "removed" &&
        col("cur_fp").isNull).count() === 0)
    } finally d.unpersist()
  }

  test("inverted index: postings sorted, bounded, consistent with df") {
    val idx = Linkage.invertedIndex(spark, sf).cache()
    try {
      assert(idx.count() > 0)
      assert(idx.filter(col("df") < Linkage.MinDf).count() === 0)
      val rows = idx.collect()
      rows.foreach { r =>
        val df = r.getLong(1)
        val ids = r.getString(2).split(",").map(_.toLong)
        assert(ids.length === math.min(df, Linkage.PostingsHead.toLong),
          s"term ${r.getString(0)}: postings head ${ids.length} != " +
            s"min(df=$df, cap=${Linkage.PostingsHead})")
        assert(ids.sameElements(ids.sorted), "postings must be sorted")
        assert(ids.distinct.length === ids.length)
      }
    } finally idx.unpersist()
  }

  test("KS drift statistic matches an exact in-memory recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1)))
    val a = docs.filter(_._1 % 2 == 0).map(_._2)
    val b = docs.filter(_._1 % 2 != 0).map(_._2)
    val (n0, n1) = (a.length.toLong, b.length.toLong)
    val support = (a ++ b).distinct.sorted
    val dNum = support.map { v =>
      math.abs(a.count(_ <= v) * n1 - b.count(_ <= v) * n0)
    }.max
    val row = Linkage.driftKs(spark, sf).head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) ===
      ((n0, n1, dNum, dNum * 1000000L / (n0 * n1))))
    // the even/odd halves differ by source mix — drift must be nonzero,
    // and D is bounded by the trivial maximum n0*n1
    assert(dNum > 0 && dNum <= n0 * n1)
  }

  test("inverted index: the postings head is the df-smallest doc ids") {
    // cross-check one term against a direct computation
    val td = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0).distinct()
    val term = td.groupBy("term").count()
      .filter(col("count") >= Linkage.MinDf)
      .orderBy(col("term")).head.getString(0)
    val want = td.filter(col("term") === term).select("doc_id")
      .collect().map(_.getLong(0)).sorted.take(Linkage.PostingsHead)
    val got = Linkage.invertedIndex(spark, sf)
      .filter(col("term") === term)
      .head.getString(2).split(",").map(_.toLong)
    assert(got.sameElements(want))
  }
}
