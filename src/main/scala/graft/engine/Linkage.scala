package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage, graph, and index-build operators — the remaining
  * corpus-infrastructure passes a training-data platform runs beside the
  * dedup/curation families: fuzzy entity resolution (blocked edit-distance
  * matching), link-graph scoring (fixed-point PageRank over the
  * customer–supplier bipartite graph), corpus snapshot diffing (the
  * change-data view between two dataset versions), and inverted-index
  * construction (term → bounded postings). All four are deterministic and
  * oracle-checked; float drift is designed out (integer fixed-point ranks,
  * md5 fingerprints, integer edit distances).
  */
object Linkage {
  type Q = (SparkSession, String) => DataFrame

  /** Oversize-block guard for [[fuzzyMatch]] — same production cap as the
    * LSH band buckets (Dedup.BucketCap): a block bigger than this is a
    * degenerate key (empty title, boilerplate prefix) whose quadratic
    * pair-space would dominate the stage; production routes such blocks
    * to a secondary blocking key, the fixture simply has none.
    */
  val FuzzyBlockCap = 64
  /** Edit-distance acceptance threshold on the 40-char title prefix. */
  val FuzzyMaxDist = 12

  /** Fuzzy entity resolution: blocked Levenshtein matching over document
    * title prefixes — the record-linkage pass that reconciles near-equal
    * entities (titles, author strings, URLs) that hash dedup cannot see.
    * Classic two-phase shape: a cheap BLOCKING key (first token) bounds
    * the candidate space, then the quadratic edit-distance comparison
    * runs only inside blocks, with [[FuzzyBlockCap]] guarding degenerate
    * keys. At 100 TB the self-join shuffles 40-byte titles, not
    * documents, and every block's pair count is ≤ cap² — candidate
    * volume stays linear in corpus size (the LSH-bucket argument,
    * Dedup.scala's four-part guard, applied to linkage).
    *
    * `levenshtein` is codegen'd in Spark and exact-integer in both
    * engines, so the (a_id, b_id, dist) triple hash-matches bit-for-bit.
    */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val titled = Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(col("text"), 1, 40).as("title"),
        split(col("text"), " ").getItem(0).as("blk"))
      // block size via window on the join key: the count reuses the
      // self-join's hash partitioning on blk — no extra exchange
      .withColumn("n_blk", count(lit(1)).over(Window.partitionBy("blk")))
      .filter(col("n_blk") <= FuzzyBlockCap)
    val a = titled.select(col("blk"), col("doc_id").as("a_id"),
      col("title").as("a_title"))
    val b = titled.select(col("blk"), col("doc_id").as("b_id"),
      col("title").as("b_title"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist",
        levenshtein(col("a_title"), col("b_title")).cast("int"))
      .filter(col("dist") <= FuzzyMaxDist)
      .select("a_id", "b_id", "dist")
  }

  /** PageRank iteration count — fixed (not convergence-tested) so the
    * result is a pure function of the data and the oracle can unroll the
    * same three rounds as CTEs.
    */
  val PrIters = 3
  /** Fixed-point scale: ranks live in micro-units (1.0 ≡ 1,000,000). */
  val PrScale = 1000000L

  /** Fixed-point PageRank over the customer–supplier bipartite graph
    * (edges = distinct (custkey, suppkey) pairs via orders ⋈ lineitem,
    * symmetrized so rank flows both ways). Ranks are INTEGER micro-units
    * and every step is integer arithmetic — `rank DIV deg` per edge,
    * `150000 + (85 · Σ) DIV 100` per node (damping 0.85 in exact
    * rationals) — so three iterations produce bit-identical BIGINTs in
    * Spark and DuckDB; floating-point PageRank could never hash-match
    * across engines (per-partition sum order differs), and fixed-point
    * accumulation is also the production answer to cross-run drift.
    *
    * Scale shape: the edge list is the big table; it joins ranks on
    * `src` every round, aggregates on `dst`, and both sides hash the
    * same keys, so AQE reuses the edge exchange across rounds (the
    * [[Dedup.dedupClusters]] iteration pattern). Degrees pre-join once.
    * Every node has ≥1 in-edge (symmetrized graph), so no dangling-mass
    * term is needed — documented rather than silently assumed.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankIter(spark, dir, PrIters)

  /** [[pageRank]] generalized to `iters` rounds — the cluster-loop form.
    *
    * Two lineage regimes, same arithmetic:
    *   - `iters ≤ [[PrIters]]`: the loop unrolls LAZILY into one plan;
    *     the degree-joined edge subtree is identical in every round, so
    *     the planner's exchange reuse materializes its shuffle once and
    *     every later round reads the reused exchange (PlanSpec-gated).
    *   - `iters > [[PrIters]]`: an unrolled plan would grow linearly in
    *     the round count (planning time, lineage depth, re-execution risk
    *     on task retry), so the loop switches to the
    *     [[Dedup.dedupClusters]] shape — the loop-invariant edge list is
    *     `localCheckpoint`ed ONCE, and each round's ranks eagerly
    *     `localCheckpoint` to truncate lineage, keeping per-round work
    *     flat (one broadcast-free join + one aggregation over
    *     checkpointed inputs) no matter how many rounds run.
    */
  def pageRankIter(spark: SparkSession, dir: String, iters: Int): DataFrame = {
    val e0 = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = e0.union(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg0 = edges.join(deg, "src")
    val truncate = iters > PrIters
    val eDeg = if (truncate) eDeg0.localCheckpoint() else eDeg0
    def round(ranks: DataFrame): DataFrame =
      eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst"), expr("pr DIV deg").as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("in_sum"))
        .select(col("dst").as("node"),
          expr(s"CAST(${PrScale * 15 / 100} + (85 * in_sum) DIV 100" +
            " AS BIGINT)").as("pr"))
    var ranks = deg.select(col("src").as("node"),
      lit(PrScale).as("pr"))
    for (_ <- 1 to iters) {
      ranks = round(ranks)
      if (truncate) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("pr"))
  }

  /** Corpus snapshot diff — the change-data view between two dataset
    * versions (the question every incremental pipeline run asks first:
    * what was added / removed / changed since the index was built?).
    * The two snapshots are carved deterministically from the fixture
    * (prev drops doc_id≡0 mod 7 and truncates doc_id≡0 mod 10 to
    * simulate edits; current drops doc_id≡0 mod 11), then compared by
    * md5 CONTENT FINGERPRINT under a full-outer join on doc_id.
    *
    * Scale shape: fingerprints are computed scan-side, so the join
    * shuffles 32-byte hashes, never text — the [[Curation]] rule
    * (fingerprints travel, payloads stay put) applied to versioning. At
    * 100 TB both sides are id-partitioned snapshots and the diff is one
    * co-partitioned shuffle join; the incremental-index queries
    * (dd_incr_bkt, ann_incr) consume exactly this diff's `added`+
    * `changed` classes as their delta input.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val prev = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 10 === 0, substring(col("text"), 1, 50))
          .otherwise(col("text"))).as("prev_fp"))
    val cur = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("cur_fp"))
    prev.join(cur, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("prev_fp").isNull, lit("added"))
          .when(col("cur_fp").isNull, lit("removed"))
          .when(col("prev_fp") =!= col("cur_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("cur_fp"))
  }

  /** Postings cap for [[invertedIndex]]: the head of each term's postings
    * list (production chunks the tail into further segments).
    */
  val PostingsHead = 20
  /** Minimum document frequency — hapax terms are index noise. */
  val MinDf = 2

  /** Inverted-index build: term → (df, bounded postings head). The
    * retrieval-side sibling of [[TextOps.bm25]]: where bm25 scores a
    * fixed query against documents, this materializes the index those
    * queries would probe.
    *
    * Scale shape: per-doc term dedup happens INSIDE the row
    * (`array_distinct` before the explode — a (doc,term) `distinct()`
    * would buy a second hash exchange on the pair key), so the build has
    * exactly ONE exchange, on term; the window's row_number and the
    * final groupBy reuse that same partitioning (plan-gated in
    * PlanSpec). The postings list is bounded
    * BEFORE collection — `collect_list(when(rn ≤ cap))` keeps at most
    * [[PostingsHead]] ids per term in the aggregation buffer, so a
    * hot term (df in the billions at 100 TB) costs the same buffer as a
    * rare one; an unbounded collect_list would OOM the reducer on the
    * first stopword. df still counts the full posting set.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val td = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(length(col("term")) > 0)
    val w = Window.partitionBy("term").orderBy("doc_id")
    td.withColumn("rn", row_number().over(w))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        // sort NUMERICALLY first, stringify after — casting before the
        // sort would order "10" before "2" and diverge from the oracle
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") <= PostingsHead,
              col("doc_id")))),
            x => x.cast("string")), ",").as("postings_head"))
      .filter(col("df") >= MinDf)
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic — the distribution
    * monitor a corpus refresh runs between versions: has the document
    * length (or quality, or token-count) distribution SHIFTED since the
    * last snapshot, beyond what row counts show? D = max |F₁(v) − F₂(v)|
    * over the merged support, computed here ENTIRELY in integers: with
    * running counts r₀/r₁ and totals n₀/n₁, the unreduced numerator
    * |r₀·n₁ − r₁·n₀| is exact BIGINT and its max divides once (floor,
    * ppm) at the boundary — both engines hash-match bit-for-bit, where a
    * float CDF difference never would. The two "versions" are the
    * even/odd doc_id halves (which differ by source mix, so the fixture
    * statistic is genuinely nonzero).
    *
    * Plan shape: one map-side-combined groupBy on the measured value
    * collapses the corpus to its VALUE SUPPORT (cardinality-sized, like
    * a histogram); the ordered running-sum window then rides a
    * SinglePartition exchange ABOVE that aggregate — the sanctioned
    * post-aggregate single-task pattern (q_domain_mix's shape): the one
    * task sees distinct values, never rows. Nulls are filtered before
    * the sort because the engines disagree on null ordering (Spark
    * NULLS FIRST, DuckDB NULLS LAST) and a null bucket has no place in
    * a CDF. At 1e12-row scale the ppm product n₀·n₁ would need DECIMAL
    * or a pre-scaled unit — the numerator comparison itself never
    * overflows the support walk.
    */
  def driftKs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(col("n_chars").isNotNull)
      .select(col("n_chars").as("v"), (col("doc_id") % 2).as("grp"))
    val counts = d.groupBy("v").agg(
      sum(when(col("grp") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c1"))
    val tot = counts.agg(sum(col("c0")).cast("long").as("n0"),
      sum(col("c1")).cast("long").as("n1"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("r0", sum(col("c0")).over(w).cast("long"))
      .withColumn("r1", sum(col("c1")).over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .select(abs(col("r0") * col("n1") - col("r1") * col("n0"))
        .as("dnum"), col("n0"), col("n1"))
      .groupBy("n0", "n1")
      .agg(max(col("dnum")).as("d_num"))
      .select(col("n0"), col("n1"), col("d_num"),
        expr("CAST(d_num * 1000000L DIV (n0 * n1) AS BIGINT)")
          .as("d_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q_fuzzy_match" -> fuzzyMatch _,
    "q_pagerank" -> pageRank _,
    "q_snapshot_diff" -> snapshotDiff _,
    "q_inverted_index" -> invertedIndex _,
    "q_drift_ks" -> driftKs _)

  private val pagerankIter = (prev: String, out: String) =>
    s"""$out AS (SELECT e.dst AS node,
       |    CAST(${PrScale * 15 / 100} + (85 * sum(r.pr // d.deg)) // 100
       |      AS BIGINT) AS pr
       |  FROM e JOIN deg d ON e.src = d.src
       |  JOIN $prev r ON e.src = r.node
       |  GROUP BY e.dst)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_fuzzy_match" ->
      s"""WITH t AS (SELECT doc_id, substr(text, 1, 40) AS title,
         |    string_split(text, ' ')[1] AS blk FROM documents),
         |c AS (SELECT *, count(*) OVER (PARTITION BY blk) AS n_blk FROM t)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist
         |FROM c a JOIN c b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE a.n_blk <= $FuzzyBlockCap
         |  AND levenshtein(a.title, b.title) <= $FuzzyMaxDist""".stripMargin,
    "q_pagerank" ->
      s"""WITH e0 AS (SELECT DISTINCT 'c' || o_custkey AS src,
         |    's' || l_suppkey AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM e0
         |  UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT src AS node, CAST($PrScale AS BIGINT) AS pr
         |  FROM deg),
         |${pagerankIter("r0", "r1")},
         |${pagerankIter("r1", "r2")},
         |${pagerankIter("r2", "r3")}
         |SELECT node, pr FROM r3""".stripMargin,
    "q_snapshot_diff" ->
      """WITH prev AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 0 THEN substr(text, 1, 50)
        |      ELSE text END) AS prev_fp
        |  FROM documents WHERE doc_id % 7 <> 0),
        |cur AS (SELECT doc_id, md5(text) AS cur_fp
        |  FROM documents WHERE doc_id % 11 <> 0)
        |SELECT coalesce(prev.doc_id, cur.doc_id) AS doc_id,
        |  CASE WHEN prev_fp IS NULL THEN 'added'
        |    WHEN cur_fp IS NULL THEN 'removed'
        |    WHEN prev_fp <> cur_fp THEN 'changed'
        |    ELSE 'unchanged' END AS status,
        |  cur_fp
        |FROM prev FULL OUTER JOIN cur ON prev.doc_id = cur.doc_id""".stripMargin,
    "q_inverted_index" ->
      s"""WITH td AS (SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |    FROM documents) WHERE len(term) > 0)
         |SELECT term, count(*) AS df,
         |  array_to_string((list(doc_id ORDER BY doc_id))[1:$PostingsHead],
         |    ',') AS postings_head
         |FROM td GROUP BY term HAVING count(*) >= $MinDf""".stripMargin,
    "q_drift_ks" ->
      """WITH d AS (SELECT n_chars AS v, doc_id % 2 AS grp
        |    FROM documents WHERE n_chars IS NOT NULL),
        |c AS (SELECT v,
        |    sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM d GROUP BY v),
        |t AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
        |    CAST(sum(c1) AS BIGINT) AS n1 FROM c),
        |r AS (SELECT v,
        |    sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS r0,
        |    sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS r1
        |  FROM c)
        |SELECT n0, n1,
        |  CAST(max(abs(r0 * n1 - r1 * n0)) AS BIGINT) AS d_num,
        |  CAST(max(abs(r0 * n1 - r1 * n0)) * 1000000 // (n0 * n1)
        |    AS BIGINT) AS d_ppm
        |FROM r CROSS JOIN t GROUP BY n0, n1""".stripMargin)
}
