package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generational (time-travel) keyed store — the versioned sibling of
  * [[StreamingQueries.streamUpsert]]'s bucket-partitioned MERGE store
  * (VERDICT r15 #5): where the destructive store overwrites touched
  * bucket partitions in place, this one is COPY-ON-WRITE — each
  * microbatch writes its merged touched buckets into an immutable new
  * generation directory and commits a full-snapshot manifest, the
  * plain-parquet expression of the Delta/Iceberg snapshot-isolation
  * shape (versioned data files + a metadata log that names which files
  * constitute each version).
  *
  * Layout under a store root:
  * {{{
  *   root/data/gen=<g>/bucket=<b>/part-*.parquet   // immutable once written
  *   root/_manifest/gen-<g>.json                    // {"gen":g,"buckets":{"b":gw,...}}
  * }}}
  *
  * The generation-`g` manifest maps EVERY live bucket to the generation
  * that last wrote it (`gw <= g`), so a snapshot read is manifest-resolved
  * partition pruning: resolve `<=Buckets` paths, scan exactly those.
  * Untouched buckets carry forward by reference — no data is copied, the
  * Delta-checkpoint move that keeps a batch's write cost proportional to
  * its touched partitions, never to the store.
  *
  * Scale design (100 TB): manifests are bucket-count-sized JSON written
  * driver-side — bounded by the layout constant like the touched-bucket
  * collect in the destructive store, and at production bucket counts
  * (thousands) still trivially driver-sized. Data writes per generation
  * are delta + touched-partition sized. Because a generation never
  * overwrites what it reads (existing buckets are read from OLDER
  * generation dirs), the merge needs no `localCheckpoint` barrier — the
  * read-own-overwrite hazard the destructive MERGE defends against
  * cannot occur by construction. Retention is a separate vacuum concern:
  * a generation older than the retention horizon can be dropped by
  * deleting its dir and every manifest that references it, exactly
  * Delta's VACUUM contract.
  *
  * What versioning buys (the two driver queries):
  *   - `q_time_travel`: read AS OF generation g — reproducible training
  *     runs pin the snapshot they read.
  *   - `q_forget_audit`: retention-then-erasure RTBF — generation g
  *     still contains a deleted user (auditable retention) while g+1
  *     provably excludes them (the [[StreamingQueries.streamForget]]
  *     tombstone merge), with both snapshots fingerprinted in one result.
  */
object VersionedStore {
  /** Bucket count, shared with the destructive store so the two stores
    * agree on routing (and the oracles on `user_id % 16`).
    */
  val Buckets: Int = StreamingQueries.UpsertBuckets

  /** Store payload columns (bucket rides as the partition dir; `gen` is
    * the generation partition dir above it).
    */
  private[streaming] val payloadSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("last_ts", TimestampType),
    StructField("last_event_id", LongType),
    StructField("last_event_type", StringType),
    StructField("last_value", DoubleType),
    StructField("n_versions", LongType)))

  /** Read-side schema: payload + the two partition columns parsed from
    * the dir names (`gen=<g>/bucket=<b>`).
    */
  private[streaming] val readSchema: StructType =
    StructType(payloadSchema.fields ++ Seq(
      StructField("gen", IntegerType),
      StructField("bucket", LongType)))

  /** Full-snapshot manifest for one generation: every live bucket mapped
    * to the generation whose dir holds its current data.
    */
  final case class Manifest(gen: Int, buckets: Map[Long, Int])

  private def manifestDir(root: String) = s"$root/_manifest"
  private def manifestPath(root: String, gen: Int) =
    f"${manifestDir(root)}/gen-$gen%05d.json"
  private[graft] def bucketPath(root: String, writerGen: Int,
      bucket: Long) = s"$root/data/gen=$writerGen/bucket=$bucket"

  /** Highest committed generation, or None for an empty store. */
  def latestGen(root: String): Option[Int] = {
    val d = new java.io.File(manifestDir(root))
    Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      .map(_.getName)
      .collect { case n if n.startsWith("gen-") && n.endsWith(".json") =>
        n.stripPrefix("gen-").stripSuffix(".json").toInt }
      .sorted.lastOption
  }

  def readManifest(root: String, gen: Int): Manifest = {
    val p = java.nio.file.Paths.get(manifestPath(root, gen))
    require(java.nio.file.Files.isRegularFile(p),
      s"versioned store has no generation $gen manifest under $root")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(java.nio.file.Files.readAllBytes(p))
    val buckets = scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.path("buckets").fields()).asScala
      .map(e => e.getKey.toLong -> e.getValue.asInt).toMap
    Manifest(node.path("gen").asInt, buckets)
  }

  private def writeManifest(root: String, m: Manifest): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(manifestDir(root)))
    val body = m.buckets.toSeq.sortBy(_._1)
      .map { case (b, g) => s""""$b":$g""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(manifestPath(root, m.gen)),
      s"""{"gen":${m.gen},"buckets":$body}""" + "\n"): Unit
  }

  /** Commit one generation: merge `batchRows` (payload columns plus a
    * `bucket` routing column, `n_versions` pre-set to 1) with the
    * touched buckets' CURRENT data (read by reference from older
    * generation dirs — copy-on-write, so the read side is never the
    * write target) under the latest-per-key (ts, event_id) argmax, write
    * the merged touched buckets into this generation's immutable dir,
    * and commit the carry-forward manifest. `gen` must be exactly
    * `previous + 1` — a gap or a replay corrupts the manifest chain and
    * fails loudly instead.
    */
  def mergeGeneration(batchRows: DataFrame, gen: Int,
      root: String): Unit = {
    val sp = batchRows.sparkSession
    val prevBuckets: Map[Long, Int] =
      if (gen == 0) {
        require(latestGen(root).isEmpty,
          s"generation 0 into a non-empty store at $root")
        Map.empty
      } else {
        require(latestGen(root).contains(gen - 1),
          s"generation $gen requires committed generation ${gen - 1} " +
            s"(store at ${latestGen(root).getOrElse(-1)})")
        readManifest(root, gen - 1).buckets
      }
    // bounded by the layout constant (<= Buckets), never by data volume
    val touched = batchRows.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val existingPaths = touched
      .flatMap(b => prevBuckets.get(b).map(g => bucketPath(root, g, b)))
    val existing =
      if (existingPaths.isEmpty)
        sp.createDataFrame(sp.sparkContext
            .emptyRDD[org.apache.spark.sql.Row], readSchema)
          .drop("gen")
      else sp.read.option("basePath", s"$root/data").schema(readSchema)
        .parquet(existingPaths: _*).drop("gen")
    val ord = struct(col("last_ts"), col("last_event_id"))
    val merged = existing.unionByName(batchRows)
      .groupBy("user_id", "bucket")
      .agg(
        max_by(struct(col("last_ts"), col("last_event_id"),
          col("last_event_type"), col("last_value")), ord).as("m"),
        sum(col("n_versions")).as("n_versions"))
      .select(col("user_id"), col("m.last_ts").as("last_ts"),
        col("m.last_event_id").as("last_event_id"),
        col("m.last_event_type").as("last_event_type"),
        col("m.last_value").as("last_value"),
        col("n_versions"), col("bucket"))
    // errorifexists ENFORCES generation immutability: rewriting a
    // committed generation is a bug, not a retry
    merged.write.mode("errorifexists").partitionBy("bucket")
      .parquet(s"$root/data/gen=$gen")
    writeManifest(root, Manifest(gen,
      prevBuckets ++ touched.map(_ -> gen)))
  }

  /** Snapshot read AS OF generation `gen`: resolve the manifest's
    * bucket→generation map to `<=Buckets` dirs and scan exactly those —
    * manifest-driven partition pruning, cost proportional to the LIVE
    * data regardless of how many generations the store has accrued. The
    * result carries the `gen` partition column (which generation last
    * wrote each bucket) and `bucket` alongside the payload.
    */
  /** Compaction (the OPTIMIZE half of the store lifecycle): commit a
    * new generation that rewrites EVERY live bucket's current data into
    * one generation dir — logically a no-op (same rows, same
    * `n_versions`), physically the move that makes all earlier
    * generation dirs unreferenced by every manifest from here on, so a
    * later [[vacuum]] can reclaim them. The read side is the manifest's
    * pruned `<=Buckets` dirs and the write is one pass over the LIVE
    * data — at 100 TB this is the periodic maintenance job a streaming
    * store schedules off-peak, cost bounded by live-store size, never
    * by generation count. Returns the compaction generation id.
    */
  def compact(spark: SparkSession, root: String): Int = {
    val latest = latestGen(root).getOrElse(
      throw new IllegalArgumentException(s"empty store at $root"))
    val m = readManifest(root, latest)
    val g = latest + 1
    if (m.buckets.nonEmpty)
      readAsOf(spark, root, latest).drop("gen")
        .write.mode("errorifexists").partitionBy("bucket")
        .parquet(s"$root/data/gen=$g")
    writeManifest(root, Manifest(g, m.buckets.keys.map(_ -> g).toMap))
    g
  }

  /** Vacuum (the retention half): drop every manifest OLDER than
    * `horizon` and every `gen=<g>/bucket=<b>` data dir that no
    * surviving manifest references. Deletion is at BUCKET-dir
    * granularity because a generation dir can be partially live — a
    * bucket written at generation 0 and never touched again is still
    * referenced by the newest manifest's carry-forward entry and MUST
    * survive a vacuum that drops generation 0's manifest (the Delta
    * VACUUM subtlety: retention is defined over snapshots, not over
    * write times). Snapshots `>= horizon` read identically after the
    * vacuum; snapshots `< horizon` fail loudly (their manifest is
    * gone). Returns (bucket dirs deleted, manifests deleted).
    */
  def vacuum(root: String, horizon: Int): (Int, Int) = {
    val latest = latestGen(root).getOrElse(
      throw new IllegalArgumentException(s"empty store at $root"))
    require(horizon >= 0 && horizon <= latest,
      s"vacuum horizon $horizon outside committed generations 0..$latest")
    // .toSeq first: mapping a Map to swapped pairs would collapse
    // entries whose writer generation collides (all-same-gen after a
    // compaction — exactly the common case)
    val live: Set[(Int, Long)] = (horizon to latest).flatMap { g =>
      readManifest(root, g).buckets.toSeq.map { case (b, gw) => (gw, b) }
    }.toSet
    val dataDir = new java.io.File(s"$root/data")
    var dirsDeleted = 0
    Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .foreach { genDir =>
        val g = genDir.getName.stripPrefix("gen=").toInt
        Option(genDir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
          .foreach { bDir =>
            val b = bDir.getName.stripPrefix("bucket=").toLong
            if (!live((g, b))) {
              graft.engine.TempArtifacts.rm(bDir)
              dirsDeleted += 1
            }
          }
        if (Option(genDir.listFiles()).getOrElse(Array.empty)
            .forall(!_.isDirectory))
          graft.engine.TempArtifacts.rm(genDir)
      }
    var manifestsDeleted = 0
    (0 until horizon).foreach { g =>
      val p = java.nio.file.Paths.get(manifestPath(root, g))
      if (java.nio.file.Files.deleteIfExists(p)) manifestsDeleted += 1
    }
    (dirsDeleted, manifestsDeleted)
  }

  /** Change-data-feed diff of two snapshot reads (both in [[readSchema]]
    * shape): net row-level changes a downstream consumer must apply to
    * move from the `from` snapshot to the `to` snapshot —
    * `insert` (key absent at from), `delete` (tombstone winner at to;
    * an insert-then-delete inside the window nets to NO row), `update`
    * (the latest event moved OR `n_versions` grew — an out-of-order
    * arrival can grow the count without moving the argmax, and CDC must
    * surface it). One full-outer key join of two manifest-pruned scans:
    * cost is live-store-sized, never generation-count-sized.
    */
  def changesBetween(from: DataFrame, to: DataFrame,
      tombstoneType: String): DataFrame = {
    val f = from.select(col("user_id").as("f_user_id"),
      col("bucket").as("f_bucket"),
      col("last_event_id").as("from_event_id"),
      col("n_versions").as("from_nv"))
    val t = to.select(col("user_id").as("t_user_id"),
      col("bucket").as("t_bucket"),
      col("last_event_id").as("to_eid"),
      col("last_event_type").as("to_type"),
      col("n_versions").as("to_nv"))
    // null-safe (<=>) key equality: the store REPRESENTS a null-key row
    // (the upsert discipline routes it to a real bucket), and a plain
    // equi-join would silently orphan both sides' null-key rows — the
    // from side vanishing, the to side misreading as an insert (the
    // NULL-key class the AdaptiveAgg join-back fix closed in r15/r16)
    f.join(t, col("f_user_id") <=> col("t_user_id") &&
        col("f_bucket") <=> col("t_bucket"), "full_outer")
      .select(coalesce(col("f_user_id"), col("t_user_id")).as("user_id"),
        coalesce(col("f_bucket"), col("t_bucket")).as("bucket"),
        col("from_event_id"), col("from_nv"), col("to_eid"),
        col("to_type"), col("to_nv"))
      .withColumn("change",
        when(col("to_type") === tombstoneType,
          when(col("from_event_id").isNull, lit(null: String))
            .otherwise("delete"))
          .when(col("from_event_id").isNull, "insert")
          .when(col("to_eid") =!= col("from_event_id") ||
            col("to_nv") =!= col("from_nv"), "update")
          .otherwise(lit(null: String)))
      .filter(col("change").isNotNull)
      .select(col("user_id"), col("bucket"), col("change"),
        col("from_event_id"),
        when(col("change") === "delete", lit(null: java.lang.Long))
          .otherwise(col("to_eid")).as("to_event_id"),
        when(col("change") === "delete", lit(null: java.lang.Long))
          .otherwise(col("to_nv") - coalesce(col("from_nv"), lit(0L)))
          .as("nv_delta"))
  }

  def readAsOf(spark: SparkSession, root: String, gen: Int): DataFrame = {
    val m = readManifest(root, gen)
    val paths = m.buckets.toSeq.sortBy(_._1)
      .map { case (b, g) => bucketPath(root, g, b) }
    if (paths.isEmpty) // an empty replay commits bucket-less generations
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], readSchema)
    else
      spark.read.option("basePath", s"$root/data").schema(readSchema)
        .parquet(paths: _*)
  }
}
