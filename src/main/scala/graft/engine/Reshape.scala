package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshaping operators (SURVEY.md §2.5 A10, §2.6 X12–X15): explode over
  * split arrays, map construction + map explode, and the dynamic-pivot
  * dummy encoding.
  */
object Reshape {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed pivot domain (FIXTURES.md: events.event_type). Passing the value
    * list to `pivot` skips Spark's eager distinct-values job (SURVEY §3 E3)
    * — at 100 TB that eager job is a full extra scan; with a known domain it
    * is pure waste. It also makes the output column set deterministic for
    * the oracle (SURVEY §7.5 risk 1).
    */
  val EventTypes: Seq[String] =
    Seq("click", "view", "purchase", "signup", "error")

  /** X12–X14 — split → explode(array) → create_map → explode(map) → re-agg
    * (`Databricks Notebook.py:310–342` dict-string decomposition analog).
    * The map hop is semantically pass-through but exercises map construction
    * and map explosion exactly as the reference does. Generate (explode)
    * output never shuffles by itself; the only exchange is the final
    * aggregation on `word` (low cardinality → tiny after partial agg).
    */
  def explodeMap(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), explode(map(col("word"), lit(1))))
      .groupBy(col("key"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .withColumnRenamed("key", "word")

  /** A10/X15 — dummy/one-hot matrix via pivot with FIXED values + fill-0
    * (`Databricks Notebook.py:342, 385, 425, 462`). `first(lit(1))` matches
    * the reference's `agg(lit(1))` presence-flag semantics; `na.fill(0)`
    * mirrors `fillna(0)`.
    */
  def pivotDummies(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(first(lit(1)))
      .na.fill(0)

  val queries: Map[String, Q] = Map(
    "q_explode_map" -> explodeMap _,
    "q_pivot_dummies" -> pivotDummies _)

  val oracles: Map[String, String] = Map(
    "q_explode_map" ->
      """SELECT w AS word, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w""",
    "q_pivot_dummies" ->
      """SELECT user_id, COALESCE(max(CASE WHEN event_type = 'click' THEN 1 END), 0) AS click, COALESCE(max(CASE WHEN event_type = 'view' THEN 1 END), 0) AS view, COALESCE(max(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchase, COALESCE(max(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS signup, COALESCE(max(CASE WHEN event_type = 'error' THEN 1 END), 0) AS error FROM events GROUP BY user_id""")
}
