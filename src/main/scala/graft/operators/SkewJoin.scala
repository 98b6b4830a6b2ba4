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

  /** PROFILE-DRIVEN salting: per-key fan-out derived from the fact side's
    * measured key frequencies instead of one global factor. Each key gets
    * `fan = ceil(freq / rowCap)` (exact integer arithmetic, so the plan
    * is a deterministic function of the data): keys at or under the cap
    * keep fan 1 — no dim replication, no salt skew-spread — and only
    * genuinely hot keys split, each into just enough sub-keys to bound
    * every reducer's rows by `rowCap`.
    *
    * Scale shape: the profile aggregation is map-side-combined (one pass,
    * |keys| output), then FILTERED to hot keys only before it broadcasts
    * to both join sides — hot keys are few by definition (that is what
    * skew means), so the broadcast stays tiny at any corpus size while
    * cold keys ride the null side of the left join at zero cost. Salting
    * is result-invariant: the driver oracle for the consuming query is
    * the plain unsalted join.
    */
  def profiledSaltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      rowCap: Long, spread: Column): DataFrame = {
    val (saltedFact, saltedDim) =
      profiledSaltParts(fact, dim, key, rowCap, spread)
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** The hot-key fan map behind [[profiledSaltedJoin]]: one row per key
    * whose fact-side frequency exceeds `rowCap`, with
    * `__fan = ceil(freq / rowCap)`. Exposed so tests can pin the exact
    * fan-out arithmetic.
    */
  private[graft] def hotKeyFan(fact: DataFrame, key: String,
      rowCap: Long): DataFrame =
    fact.groupBy(key).agg(count(lit(1)).as("__freq"))
      .filter(col("__freq") > rowCap)
      // ceil(freq/cap) without leaving integer arithmetic (DIV, not /:
      // the float division would be exact here but DIV keeps the whole
      // chain integer-typed end to end)
      .select(col(key),
        expr(s"(__freq + ${rowCap - 1}) DIV $rowCap").as("__fan"))

  /** The two salted sides of [[profiledSaltedJoin]], pre-join — exposed
    * so tests can assert the split shape directly: a hot key's fact rows
    * land on exactly `__fan` distinct `(key, __salt)` sub-keys, and the
    * dim side replicates each key exactly `__fan` times (1 for cold keys).
    */
  private[graft] def profiledSaltParts(fact: DataFrame, dim: DataFrame,
      key: String, rowCap: Long, spread: Column): (DataFrame, DataFrame) = {
    val hot = hotKeyFan(fact, key, rowCap)
    val saltedFact = fact.join(broadcast(hot), Seq(key), "left")
      .withColumn("__fan", coalesce(col("__fan"), lit(1L)))
      .withColumn("__salt",
        pmod(spread.cast("long"), col("__fan")).cast("int"))
      .drop("__fan")
    val saltedDim = dim.join(broadcast(hot), Seq(key), "left")
      .withColumn("__fan", coalesce(col("__fan"), lit(1L)))
      .withColumn("__salt",
        explode(sequence(lit(0), (col("__fan") - 1).cast("int"))))
      .drop("__fan")
    (saltedFact, saltedDim)
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
