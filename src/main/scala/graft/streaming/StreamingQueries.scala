package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible streaming surface: the windowed-aggregation stream run
  * to completion over the finite fixture replay, with the SAME oracle as
  * its batch twin `q_event_window`.
  *
  * Complete output mode makes the result batch-deterministic: after
  * `processAllAvailable` the memory sink holds the final aggregation
  * state over every event regardless of how the file source split the
  * replay into microbatches (append-mode outputs would depend on
  * watermark advancement between batches — not a property to hash).
  * The query therefore proves the streaming pipeline end to end — file
  * source, event-time windows, state store, sink — against a DuckDB
  * oracle, not just rows>0.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  private val runSeq = new AtomicLong(0)

  def streamEventWindow(spark: SparkSession, dir: String): DataFrame = {
    // unique sink name: queries can run concurrently in one session
    val table = s"graft_stream_win_${runSeq.incrementAndGet()}"
    val q = EventStream.runToMemory(spark, dir, table)
    try q.processAllAvailable() finally q.stop()
    spark.table(table)
      .select(col("window_start"), col("event_type"), col("n"),
        round(col("sum_value").cast("double"), 2).as("sum_value"),
        round(col("sum_value").cast("double") / col("n"), 6)
          .as("avg_value"))
  }

  val queries: Map[String, Q] = Map(
    "q_stream_event_window" -> streamEventWindow _)

  /** Identical to the batch `q_event_window` oracle: the stream replays
    * the same finite fixture, and complete mode converges to the batch
    * aggregate.
    */
  val oracles: Map[String, String] = Map(
    "q_stream_event_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value, round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_value FROM events GROUP BY 1, 2""")
}
