package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus a
  * decode / feature-extract stage behind `mapPartitions`.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC FAKE (clearly marked below); everything around it — binary
  * column construction, schema, typed Dataset batch shape, partition-wise
  * execution, metadata extraction — is the real Spark plumbing a production
  * decoder would drop into.
  *
  * Scale design: payload bytes ride the same columnar scan as everything
  * else (parquet binary columns are page-compressed and column-pruned away
  * when a query reads only metadata). Decode runs partition-wise with no
  * shuffle; at 100 TB the knob that matters is
  * `spark.sql.files.maxPartitionBytes` so one task holds a bounded number
  * of payloads in memory.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** One decoded media row: metadata + extracted feature vector. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, features: Array[Double])

  /** Synthesize the media table: payload = 4-byte magic + UTF-8 content
    * (fixtures carry no real media; FIXTURES.md §C pattern). Deterministic,
    * so the metadata query is oracle-checkable.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      concat(lit("IMG0"), col("text")).cast("binary").as("payload"))

  /** Metadata pass over binary payloads: byte length, magic prefix,
    * content digest. Pure column ops — codegen'd, no decode.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("media_type"),
      length(col("payload")).as("n_bytes"),
      substring(col("payload").cast("string"), 1, 4).as("magic"),
      sha2(col("payload"), 256).as("sha256"))

  /** ======= STUB DECODER =======
    * Stands in for an image/audio decode (libjpeg/ffmpeg/etc. are not in
    * this container). Deterministic in the payload bytes so tests are
    * stable. A real implementation replaces ONLY this function; the
    * Dataset plumbing in [[decodeFeatures]] is production-shaped.
    */
  def stubDecode(docId: Long, mediaType: String,
      payload: Array[Byte]): MediaFeatures = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    // "features": 8 deterministic byte-histogram moments of the payload
    val feats = Array.tabulate(8) { k =>
      var acc = 0.0
      var i = k
      while (i < n) { acc += (payload(i) & 0xff) / 255.0; i += 8 }
      acc / math.max(1, (n + 7 - k) / 8)
    }
    MediaFeatures(docId, mediaType, n, width, height, feats)
  }

  /** Partition-wise decode + feature extraction: binary rows in, typed
    * feature rows out. `mapPartitions` (not per-row UDF) so a real decoder
    * can amortize codec init per partition — the Scala analog of a
    * batch-iterating Python `mapInPandas` decode stage.
    */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"), col("payload"))
      // null payloads are quarantined in-plan (codegen'd filter) before
      // the decode stage: a corrupt/absent blob must drop the row, not
      // NPE a cluster job inside the codec lambda
      .filter(col("payload").isNotNull)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec handles, buffers)
        it.map { case (id, mt, bytes) => stubDecode(id, mt, bytes) }
      }
  }

  /** Frame/sample selection analog: deterministic stride sampling of the
    * payload (video frame-sampling shape without a codec). Output is one
    * row per sampled offset — the explode-to-frames pattern.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("frame_off",
        explode(sequence(lit(0), length(col("payload")) - 1, lit(64))))
      .select(col("doc_id"), col("frame_off"),
        substring(col("payload").cast("string"),
          col("frame_off") + 1, lit(4)).as("frame_magic"))

  /** Aggregate view over the decoded features (drives the decode path from
    * a DataFrame query so Verify/Bench exercise it; rows-only check — the
    * stub decoder has no SQL equivalent worth mirroring).
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir).toDF()
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(sum(element_at(col("features"), 1)), 6).as("sum_f0"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> multimodalMeta _,
    "q_multimodal_decode" -> multimodalDecode _)

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type, CAST(4 + strlen(text) AS INTEGER) AS n_bytes, 'IMG0' AS magic, sha256('IMG0' || text) AS sha256 FROM documents""")
}
