package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable scalar-expression helpers (SURVEY.md §2.6) — the driver-side
  * Python loops of the reference (`functools.reduce` recodes, the weekday
  * hours loop) become plan-building folds here: N columns recoded in ONE
  * projection, no UDFs, no extra passes (SURVEY §2.8).
  */
object ScalarOps {

  /** The reference's boolean recode (`Databricks Notebook.py:234–238`,
    * quirk #2 preserved): "True" -> "1", "False" -> "0", anything else ->
    * "Missing" — applied to every named column in one `select`, the Scala
    * re-expression of the notebook's `functools.reduce` loop over
    * `withColumn`s (which Catalyst would collapse anyway, but building one
    * projection keeps analysis O(cols) instead of O(cols²)).
    */
  def recodeBooleans(df: DataFrame, cols: Seq[String]): DataFrame = {
    val recoded = df.columns.map { c =>
      if (cols.contains(c))
        when(col(c) === "True", lit(1).cast("string"))
          .when(col(c) === "False", lit(0).cast("string"))
          .otherwise(lit("Missing")).as(c)
      else col(c)
    }
    df.select(recoded.toIndexedSeq: _*)
  }

  /** "Missing" -> 0 recode pass (`Databricks Notebook.py:685–691`). */
  def missingToZero(df: DataFrame, cols: Seq[String]): DataFrame = {
    val recoded = df.columns.map { c =>
      if (cols.contains(c))
        when(col(c) === "Missing", lit("0")).otherwise(col(c)).as(c)
      else col(c)
    }
    df.select(recoded.toIndexedSeq: _*)
  }

  /** Hour-of-day from an "H:mm" fragment (`Databricks Notebook.py:497`). */
  def hourOf(c: Column): Column = substring_index(c, ":", 1).cast("int")

  /** Past-midnight close wrap (+24 when close <= open; quirk #6,
    * `Databricks Notebook.py:502–507`).
    */
  def wrapClose(open: Column, close: Column): Column =
    when(close <= open, close + 24).otherwise(close)

  /** Recency days from a fixed anchor date (`Databricks Notebook.py:132`). */
  def recencyDays(anchor: String, ts: Column): Column =
    datediff(lit(anchor), ts)

  /** Strip stringified-dict punctuation (`Databricks Notebook.py:284–289`). */
  def stripDictPunct(c: Column): Column = translate(c, "{}'", "")
}
