package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join for the keys AQE cannot save: salt the skewed
  * (fact) side into `saltFactor` sub-keys and explode the build (dim) side
  * across every salt value, so one hot key spreads over `saltFactor`
  * shuffle partitions instead of hammering one reducer.
  *
  * When to use at 100 TB: AQE's skew-join split handles most cases for
  * sort-merge joins; salting is for the residual cases — aggregations over
  * a hot key, or joins where the planner cannot split (e.g. a hot key that
  * is also the output partitioning). The dim side is replicated
  * `saltFactor` times — keep it small or broadcast-sized.
  */
object SkewJoin {

  /** Equi-join `fact ⋈ dim` on `key`, salted `saltFactor` ways.
    * Deterministic salt: `pmod(hash-free row spreader)` uses a cheap
    * arithmetic mix of a caller-supplied spread column (any roughly-uniform
    * column works; monotonically_increasing_id as a fallback) so results
    * stay reproducible.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, spread: Option[Column] = None): DataFrame = {
    val saltCol = pmod(
      spread.getOrElse(monotonically_increasing_id()).cast("long"),
      lit(saltFactor.toLong)).cast("int")
    val saltedFact = fact.withColumn("__salt", saltCol)
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe grouped count: two-phase aggregation — partial count per
    * (key, salt), then final sum per key. The classic hot-key aggregation
    * rewrite (partial aggregation already does this for algebraic
    * aggregates; this form is for pipelines that need the intermediate
    * per-salt grain, e.g. top-k per hot key).
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int,
      spread: Column): DataFrame =
    df.withColumn("__salt",
        pmod(spread.cast("long"), lit(saltFactor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
