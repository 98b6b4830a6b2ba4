package graft

import org.apache.spark.sql.functions._
import graft.engine.Bpe

/** BPE trainer/tokenizer invariants: canonical greedy merge semantics,
  * lossless round-trip of the tokenization, merge-list determinism, and
  * the budget-selection contract. The cross-engine hash gate lives in
  * the q_bpe_* oracle rows; these pin the algorithm's laws.
  */
class BpeSpec extends SparkSpec {

  test("vocab: ranked merge list, hierarchical merges allowed") {
    val rules = Bpe.bpeVocab(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5)))
      .sortBy(_._1)
    // the fixture corpus fills every round: 64 merges in 8 rounds of 8
    assert(rules.map(_._1).toSeq == (1L to Bpe.Merges).toSeq)
    assert(rules.map(_._2).distinct.toSeq == (1L to Bpe.Rounds).toSeq)
    // merged symbol is the concatenation, counts are positive
    rules.foreach { case (_, _, l, r, m, c) =>
      assert(m == l + r)
      assert(c > 0)
    }
    // batching law: rules within one round are pairwise symbol-disjoint
    // (the property that makes within-round application order-free) — a
    // symbol appears in exactly one rule per round (twice iff self-pair)
    rules.groupBy(_._2).foreach { case (round, rs) =>
      assert(rs.size <= Bpe.BatchSize, s"round $round oversize")
      val counts = rs.flatMap(t => Seq(t._3, t._4))
        .groupBy(identity).map { case (s, o) => s -> o.size }
      rs.foreach { case (_, _, l, r, _, _) =>
        val want = if (l == r) 2 else 1
        assert(counts(l) == want && counts(r) == want,
          s"round $round: ($l,$r) shares a symbol")
      }
    }
    // merge list is deterministic across a fresh (non-memoized) session:
    // the memo is keyed by session, so a second SparkSession retrains
    val rules2 = Bpe.bpeVocab(spark.newSession(), sf).collect()
      .map(r => (r.getLong(0), r.getString(4))).sortBy(_._1)
    assert(rules2.toSeq == rules.map(t => (t._1, t._5)).toSeq)
  }

  test("selectBatch: used-set greedy disjointness on crafted windows") {
    // rank 1 always selected; overlap with a KEPT pair skips; overlap
    // with a merely REJECTED pair does not; batch caps at BatchSize
    val cand = Seq(
      ("a", "b", 10L), // selected (rank 1)
      ("b", "c", 9L),  // rejected: b kept at rank 1
      ("c", "d", 8L),  // selected: c only appeared in a REJECTED pair
      ("e", "e", 7L),  // selected: self-pair
      ("d", "e", 6L),  // rejected: both symbols kept
      ("f", "g", 5L))  // selected
    assert(Bpe.selectBatch(cand) == Seq(
      ("a", "b", 10L), ("c", "d", 8L), ("e", "e", 7L), ("f", "g", 5L)))
    val big = (0 until 26).map(i => (s"x$i", s"y$i", (100 - i).toLong))
    assert(Bpe.selectBatch(big) == big.take(Bpe.BatchSize))
    assert(Bpe.selectBatch(Nil).isEmpty)
  }

  test("tokenize: BPE stream reconstructs the original text exactly") {
    // removing intra-token spaces and mapping the end-of-word marker
    // back to a separator must give back the source text: BPE is a
    // segmentation, never a rewrite
    val bad = Bpe.bpeTokenize(spark, sf)
      .join(graft.engine.Tables.documents(spark, sf), Seq("doc_id"))
      .select(col("doc_id"),
        expr("rtrim(replace(replace(bpe_text, ' ', ''), '_', ' '))")
          .as("rebuilt"),
        col("text"))
      .filter(col("rebuilt") =!= col("text"))
      .count()
    assert(bad == 0L)
  }

  test("CJK pre-tokenization: segmentation words obey the symbol round-trip law") {
    // the trainer's pre-tokenizer is TextOps.segmentTokens: CJK/kana/
    // hangul words arrive as single codepoints, Latin words as runs.
    // The per-word BPE law (initSyms then collapsing spaces and mapping
    // the end-of-word marker back) must recover every word EXACTLY —
    // including the planted CJK ones, where pre-segmentation the whole
    // line was one "word" the trainer could never merge sensibly.
    val txt = "大规模语料 training データ 모델 mixed128"
    val rows = spark.range(1)
      .select(explode(
        graft.engine.TextOps.segmentTokens(lit(txt))).as("word"))
      .withColumn("syms", expr(
        "concat(rtrim(regexp_replace(word, '(.)', '$1 ')), ' _')"))
      .withColumn("rebuilt", expr(
        "rtrim(replace(replace(syms, ' ', ''), '_', ' '))"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2) === r.getString(0),
        s"round-trip broke for ${r.getString(0)}")
    }
    val words = rows.map(_.getString(0)).toSeq
    // per-codepoint contract for the unsegmented scripts
    assert(words.take(5) === Seq("大", "规", "模", "语", "料"))
    assert(words.contains("training") && words.contains("mixed128"))
    assert(words.count(_.length == 1) === 10) // 5 han + 3 kana + 2 hangul
  }

  test("detokenize query: round trip holds on every document") {
    val d = Bpe.bpeDetokenize(spark, sf).cache()
    try {
      assert(d.count() === 500)
      assert(d.filter(!col("round_trip_ok")).count() === 0)
      // token counts and char lengths carried through unchanged
      assert(d.filter(col("n_bpe_tokens") <= 0 || col("n_chars") <= 0)
        .count() === 0)
    } finally { d.unpersist(): Unit }
  }

  test("tokenize: token counts bounded by chars+words and words") {
    val rows = Bpe.bpeTokenize(spark, sf)
      .join(graft.engine.Tables.documents(spark, sf), Seq("doc_id"))
      .select(col("n_words"), col("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, t, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // each word is at least 1 token and at most chars+1 (marker)
      assert(t >= w)
      assert(t <= c + w) // c counts separators too, safe upper bound
    }
  }

  test("budget: kept docs lie inside the budget, order is quality-first") {
    val kept = Bpe.bpeBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    kept.foreach { case (_, n, _, cum) =>
      assert(cum + n <= Bpe.BpeBudget)
    }
    // cum_before respects the (q_micro desc, doc_id) stream order
    val sorted = kept.sortBy(t => (-t._3, t._1))
    assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
  }

  test("greedy leftmost fold: run of four merges pairwise, not skipping") {
    // "a a a a" + (a,a) must give "aa aa" and "a a a" must give "aa a" —
    // the string-replace shortcut gets the even-run case wrong, the
    // fold must not
    import spark.implicits._
    val st = Seq(("w1", 1L, "a a a a"), ("w2", 1L, "a a a"))
      .toDF("word", "freq", "syms")
    val applied = invokeApply(st, "a", "a").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(applied("w1") == "aa aa")
    assert(applied("w2") == "aa a")
  }

  test("applyMergeBatch: single fold ≡ chained application on a " +
      "disjoint batch, and the created-symbol collision falls back") {
    import spark.implicits._
    // exercises: plain merges, a self-pair run (even and odd), adjacent
    // pairs from different rules, and a non-matching tail
    val st = Seq(
      ("w1", 1L, "a b c d"), ("w2", 1L, "a a a a"), ("w3", 1L, "a a a"),
      ("w4", 1L, "c d a b"), ("w5", 1L, "b a d c"), ("w6", 1L, "x y z"))
      .toDF("word", "freq", "syms")
    val batch = Seq(("a", "b"), ("c", "d"), ("x", "y"))
    val chained = batch.foldLeft(st) { case (s, (l, r)) =>
      invokeApply(s, l, r) }
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val single = Bpe.applyMergeBatch(st, batch)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(single == chained)
    assert(single("w1") == "ab cd")
    assert(single("w5") == "b a d c")
    // created-symbol collision: ("a","b") creates "ab", which a later
    // pair ("c","ab") consumes — only the CHAINED order sees the fresh
    // symbol, so the batch form must detect the collision and chain
    val st2 = Seq(("v1", 1L, "c a b"), ("v2", 1L, "a b c")).toDF(
      "word", "freq", "syms")
    val collide = Seq(("a", "b"), ("c", "ab"))
    val chained2 = collide.foldLeft(st2) { case (s, (l, r)) =>
      invokeApply(s, l, r) }
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val single2 = Bpe.applyMergeBatch(st2, collide)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(single2 == chained2)
    assert(single2("v1") == "cab")
  }

  // applyMerge is private; replicate its expr contract through the
  // public training path is impossible on crafted state, so mirror the
  // exact SQL here (kept in sync by the round-trip + oracle gates)
  private def invokeApply(df: org.apache.spark.sql.DataFrame,
      l: String, r: String): org.apache.spark.sql.DataFrame =
    df.withColumn("syms", expr(
      s"""aggregate(
         |  slice(split(syms, ' '), 2, size(split(syms, ' ')) - 1),
         |  element_at(split(syms, ' '), 1),
         |  (acc, x) -> CASE
         |    WHEN x = '$r' AND (acc = '$l'
         |        OR right(acc, length('$l') + 1) = concat(' ', '$l'))
         |    THEN concat(left(acc, length(acc) - length('$l')), '$l', '$r')
         |    ELSE concat(acc, ' ', x) END)""".stripMargin))
}
