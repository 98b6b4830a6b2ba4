package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet loaders for the driver fixtures (TESTDATA.md / FIXTURES.md §B).
  *
  * Scale notes (100 TB design): each loader is a plain columnar scan — no
  * eager action, no schema-inference job (parquet footers carry the schema),
  * so Catalyst can push filters and prune columns into the scan
  * (`PushedFilters` / `ReadSchema` in `.explain("formatted")`). The
  * reference instead infers schemas from JSON with an eager sampling job per
  * table (`Databricks Notebook.py:34,48,62,80,94,108`) — at 100 TB that is a
  * full extra pass; parquet-with-footers is the scalable re-expression.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped in two physical layouts across fixture
    * generations: parquet TIMESTAMP(NANOS) (Spark rejects nanos outright —
    * read as a nano-epoch long via `nanosAsLong` and truncate to micros,
    * the same floor DuckDB applies), and tz-less TIMESTAMP(MICROS) (read
    * as a UTC-instant TimestampType — NTZ inference is disabled
    * engine-wide, see [[graft.GraftSession]]). The LongType guard picks
    * the right normalization per file, so either generation yields the
    * same UTC instants. The streaming surface sniffs the same physical
    * layout from the footers before declaring its readStream schema
    * ([[graft.streaming.EventStream.readEvents]]), so both loaders track
    * fixture regenerations together.
    *
    * Side effect, by design: `nanosAsLong` is a session-wide SQLConf (no
    * per-read option exists), so after the first events load any other
    * nanos-timestamp parquet in the session also reads as longs instead of
    * failing fast. The flag's value is constant, so the write is
    * idempotent and safe under concurrent queries.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
