package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the driver's parquet fixtures (SURVEY.md
  * §2.1): the reference loads EVERY table from JSON — whole-file arrays
  * (`spark.read.option("multiline","true").json`, `Databricks
  * Notebook.py:34/62/80/108`) and line-delimited JSONL (NB:48/94) — with
  * eager schema inference. This module re-expresses both, plus CSV and the
  * writer side the notebook never had.
  *
  * Scale notes: schema inference runs an extra sampling job per source —
  * fine interactively, waste at 100 TB; every reader takes an optional
  * explicit schema to skip it. Multiline JSON cannot be split (one file =
  * one task), so at scale JSONL is the only parallelizable JSON layout —
  * mirrorred by [[writeJsonl]] emitting partitioned line files.
  */
object JsonCsvSources {

  /** Whole-file JSON array scan (reference S1). One task per file — callers
    * at scale must shard input into many files.
    */
  def readMultilineJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiline", "true")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** Line-delimited JSON scan (reference S2) — splittable, the scalable
    * JSON layout.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** CSV with header; inference optional for the same reason as JSON. */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** JSONL sink (splittable output, one file per partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Whole-file JSON ARRAY sink — the writer twin of [[readMultilineJson]].
    * A JSON array is one document, so the write is inherently single-file:
    * the frame coalesces to one partition and streams `[`, one element per
    * line (comma-prefixed), `]` — no driver collect, no per-partition
    * materialization. Only for dimension-sized frames; fact-sized data
    * belongs in JSONL ([[writeJsonl]]).
    */
  def writeMultilineJson(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.Encoders
    df.toJSON.repartition(1).mapPartitions { it =>
      Iterator("[") ++
        it.zipWithIndex.map { case (r, i) =>
          (if (i == 0) "" else ",") + r
        } ++ Iterator("]")
    }(Encoders.STRING)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** CSV sink with header. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Partitioned parquet sink — the layout that makes partition pruning
    * work downstream (predicates on the partition column skip whole
    * directories; the reference had no writes at all, SURVEY §2.1 S8).
    */
  def writeParquetPartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** ORC scan — the other splittable columnar format Spark ships natively;
    * like parquet it carries its own schema, supports predicate pushdown
    * and column pruning, and is the interchange format for Hive-era
    * warehouses a corpus ingest often has to read from.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink (splittable columnar output, one file per partition). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Avro scan — the ROW-oriented interchange format Kafka/streaming
    * ingests actually hand a batch engine (schema'd, splittable,
    * append-friendly; Spark 4 ships the datasource in spark-sql, no
    * external artifact). Row-major means no column pruning at the
    * reader — an Avro feed should be converted to parquet/ORC once on
    * landing, which is exactly the round-trip this source exists for.
    */
  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroFormat).load(path)

  /** Avro sink (one container file per partition, schema embedded). */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(AvroFormat).save(path)

  /** This distribution bundles the Avro datasource CLASSES in spark-sql
    * but not the `avro` shortname's DataSourceRegister service entry
    * (that file ships in the separate spark-avro artifact), so the
    * format is addressed by its public class name — Spark's documented
    * lookup fallback. Swap for "avro" on a distribution that carries
    * the module's service registration.
    */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  /** XML scan (Spark 4 ships the XML source natively) — the interchange
    * format legacy feeds and document corpora (Wikipedia dumps, PubMed,
    * sitemap/feed crawls) actually arrive in. Default (non-multiline)
    * mode splits input by `rowTag` occurrences, so large row-per-record
    * files parallelize like JSONL; an explicit schema skips the
    * inference pass (XML infers by full sampling — waste at scale).
    */
  def readXml(spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      rowTag: String = "row"): DataFrame = {
    val r = spark.read.option("rowTag", rowTag)
    schema.fold(r)(s => r.schema(s)).xml(path)
  }

  /** XML sink — one `rowTag` element per record, one file per partition
    * (splittable on re-read by the same tag).
    */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).xml(path)
}
