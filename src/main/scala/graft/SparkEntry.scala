package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` maps every implemented operator (SURVEY §2 inventory + the
  * training-data-pipeline extensions) to a deterministic DataFrame builder
  * over the fixture dir; `oracleSql` carries the DuckDB-equivalent ANSI SQL
  * for the hash-compare gate. Column names/types are aligned on both sides
  * (driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Recency-discounted conditional aggregation — the reference's richest
    * single statement (`Databricks Notebook.py:129–156`), see
    * [[graft.engine.RelOps.aggMulti]].
    */
  def entry(spark: SparkSession): DataFrame =
    RelOps.aggMulti(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelOps.queries ++ Reshape.queries ++ Pipeline.queries ++ Ext.queries ++
      TextOps.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ MlSuite.queries ++ SqlEntry.queries ++
      Curation.queries ++ SourceQueries.queries ++ Linkage.queries ++
      Bpe.queries ++ JoinOps.queries ++
      graft.streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelOps.oracles ++ Reshape.oracles ++ Pipeline.oracles ++ Ext.oracles ++
      TextOps.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ MlSuite.oracles ++ SqlEntry.oracles ++
      Curation.oracles ++ SourceQueries.oracles ++ Linkage.oracles ++
      Bpe.oracles ++ JoinOps.oracles ++
      graft.streaming.StreamingQueries.oracles
}
