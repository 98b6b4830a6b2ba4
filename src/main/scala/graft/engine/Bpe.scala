package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and application — the
  * "model tokens, not whitespace tokens" operator a training-data
  * pipeline hits first (beyond-reference; the reference's token use is
  * whitespace word counts, `Databricks Notebook.py` has no tokenizer).
  *
  * Training is the textbook BPE trainer re-expressed for Spark's
  * execution model: it operates on the DISTINCT-WORD FREQUENCY table
  * (one corpus-sized shuffle to build, then every iteration touches only
  * the dictionary — at 100 TB the dictionary is ~1e8 rows, not 1e12).
  * Each of the [[Merges]] iterations is (1) an adjacent-pair count
  * weighted by word frequency — one dictionary-sized shuffle, (2) a
  * 1-ROW collect of the argmax pair (ties broken (count desc, l, r) so
  * the merge list is a total order, bit-identical to the oracle's
  * `ORDER BY ... LIMIT 1`), and (3) a map-side greedy-leftmost fold
  * applying the merge — a higher-order `aggregate` over the symbol
  * array, no UDF. Driver state is bounded by [[Merges]] pairs (the same
  * bounded-collect contract as the IVF probed-cell list); per-iteration
  * states are `localCheckpoint`ed so the K-deep iteration does not
  * compound lineage (the `dedupClusters` precedent).
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

  /** Merge count. Small enough that the oracle's unrolled per-iteration
    * CTE chain stays readable; a production vocab build raises it (the
    * iteration cost is dictionary-sized, so 32k merges is feasible).
    */
  val Merges = 8

  /** Token budget for [[bpeBudget]]: BPE tokens ≈ 4.6× whitespace words
    * on the fixture corpus, so 40k selects roughly the same top-third
    * slice as `q_token_budget`'s 10k word budget.
    */
  val BpeBudget = 40000L

  /** One learned merge: 1-based rank, left/right symbols, merged symbol,
    * and the frequency-weighted pair count that won the argmax.
    */
  final case class MergeRule(merge_rank: Long, l: String, r: String,
      merged: String, pair_count: Long)

  private def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).cast("long").as("freq"))

  // initial symbol sequence: one char per symbol + the end-of-word marker
  private def initSyms: Column =
    concat(rtrim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" _"))

  /** Frequency-weighted adjacent-pair argmax over the current state —
    * exactly one row comes back to the driver.
    */
  private def bestPair(state: DataFrame): Array[Row] =
    state
      .select(col("freq"), split(col("syms"), " ").as("tok"))
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(tok) - 1), " +
          "i -> struct(element_at(tok, i) AS l, element_at(tok, i + 1) AS r))"
      )).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("pair_count"))
      .orderBy(col("pair_count").desc, col("l"), col("r"))
      .limit(1)
      .collect()

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

  /** Train [[Merges]] merges over the corpus under `dir`; returns the
    * ordered merge list and the final word→symbols dictionary
    * (lineage-free via localCheckpoint). Memoized per (session, dir):
    * all three q_bpe_* queries share one training run.
    */
  private[engine] def train(spark: SparkSession, dir: String)
      : (Seq[MergeRule], DataFrame) =
    SessionMemo.getOrCompute(spark, s"bpe:$dir") {
      var state = wordFreq(spark, dir)
        .withColumn("syms", initSyms)
        .localCheckpoint()
      val rules = Seq.newBuilder[MergeRule]
      var k = 1
      var exhausted = false
      while (k <= Merges && !exhausted) {
        bestPair(state) match {
          case Array(row) =>
            val l = row.getString(0)
            val r = row.getString(1)
            rules += MergeRule(k.toLong, l, r, l + r, row.getLong(2))
            state = applyMerge(state, l, r).localCheckpoint()
          case _ => exhausted = true // no pairs left (degenerate corpus)
        }
        k += 1
      }
      (rules.result(), state)
    }

  /** The learned merge table: (merge_rank, l, r, merged, pair_count). */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val (rules, _) = train(spark, dir)
    import spark.implicits._
    rules.toDF().select("merge_rank", "l", "r", "merged", "pair_count")
  }

  // (doc_id, pos, word) with empties dropped — positions keep doc order
  private def docWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
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

  /** The unrolled training chain as DuckDB CTEs: sK = state after merge
    * K, bK = merge K. The oracle replays the SAME algorithm (pair argmax
    * with (count desc, l, r) tie-break, greedy-leftmost fold via
    * list_reduce) so vocab, tokenization, and budget are all
    * hash-compared end-to-end, not spot-checked.
    */
  private def bpeCtes: String = {
    val sb = new StringBuilder
    sb ++=
      """w AS (SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY t),
        |s0 AS (SELECT word, freq,
        |  rtrim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' _' AS syms
        |  FROM w)""".stripMargin
    for (k <- 1 to Merges) {
      sb ++= s""",
        |p$k AS (SELECT tok[i] AS l, tok[i+1] AS r,
        |  CAST(sum(freq) AS BIGINT) AS pair_count
        |  FROM (SELECT freq, string_split(syms, ' ') AS tok FROM s${k - 1}),
        |       (SELECT unnest(range(1, len(tok))) AS i) GROUP BY 1, 2),
        |b$k AS (SELECT l, r, pair_count FROM p$k
        |  ORDER BY pair_count DESC, l, r LIMIT 1),
        |s$k AS (SELECT word, freq, list_reduce(string_split(syms, ' '),
        |    (acc, x) -> CASE WHEN x = b$k.r AND (acc = b$k.l
        |        OR right(acc, length(b$k.l) + 1) = ' ' || b$k.l)
        |      THEN left(acc, length(acc) - length(b$k.l)) || b$k.l || b$k.r
        |      ELSE acc || ' ' || x END) AS syms FROM s${k - 1}, b$k)"""
        .stripMargin
    }
    sb.toString
  }

  // word-level corpus explode shared by the tokenize/budget oracles
  private val tkCte =
    """tk AS (SELECT doc_id, i AS pos, w[i] AS word FROM
      |   (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |   (SELECT unnest(range(1, len(w) + 1)) AS i) WHERE w[i] <> '')"""
      .stripMargin

  val queries: Map[String, Q] = Map(
    "q_bpe_vocab" -> bpeVocab _,
    "q_bpe_tokenize" -> bpeTokenize _,
    "q_bpe_detokenize" -> bpeDetokenize _,
    "q_bpe_budget" -> bpeBudget _)

  def oracles: Map[String, String] = {
    val vocabUnion = (1 to Merges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS merge_rank, l, r, " +
        s"l || r AS merged, pair_count FROM b$k")
      .mkString(" UNION ALL ")
    Map(
      "q_bpe_vocab" ->
        s"WITH $bpeCtes\nSELECT * FROM ($vocabUnion)",
      "q_bpe_tokenize" ->
        s"""WITH $bpeCtes,
           |$tkCte,
           |j AS (SELECT t.doc_id, t.pos, s.syms,
           |    len(string_split(s.syms, ' ')) AS nt
           |  FROM tk t JOIN s$Merges s ON t.word = s.word)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
           |  string_agg(syms, ' ' ORDER BY pos) AS bpe_text
           |FROM j GROUP BY doc_id""".stripMargin,
      "q_bpe_detokenize" ->
        s"""WITH $bpeCtes,
           |$tkCte,
           |j AS (SELECT t.doc_id, t.pos, s.syms,
           |    len(string_split(s.syms, ' ')) AS nt
           |  FROM tk t JOIN s$Merges s ON t.word = s.word),
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
           |  FROM tk t JOIN s$Merges s ON t.word = s.word
           |  GROUP BY t.doc_id),
           |q AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
           |    len(list_filter(string_split(text, ' '),
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
