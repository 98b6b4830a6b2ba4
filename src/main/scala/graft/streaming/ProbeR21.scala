package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** TEMPORARY round-21 measurement probe (deleted before the round
  * closes): per-streaming-query microbatch decomposition — batch count,
  * per-phase durationMs (addBatch / walCommit / stateCommit), state
  * operator counts — so streaming-floor work targets measured time.
  * Registered via `spark.sql.streaming.streamingQueryListeners` so the
  * per-query child sessions inherit it.
  */
class ProbeListenerR21 extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    val states = p.stateOperators.map(s =>
      s"op=${s.operatorName} rows=${s.numRowsTotal} " +
        s"commitMs=${s.commitTimeMs} mem=${s.memoryUsedBytes}")
      .mkString(" | ")
    ProbeR21.progress.add(s"batch=${p.batchId} rows=${p.numInputRows} " +
      s"trigger=${dur.get("triggerExecution")} " +
      s"addBatch=${dur.get("addBatch")} " +
      s"getBatch=${dur.get("getBatch")} " +
      s"latestOffset=${dur.get("latestOffset")} " +
      s"planning=${dur.get("queryPlanning")} " +
      s"walCommit=${dur.get("walCommit")} " +
      s"commitOffsets=${dur.get("commitOffsets")} " +
      s"[$states]")
  }
}

object ProbeR21 {
  val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nThreads = scala.util.Try(cpus.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", nThreads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.streaming.ProbeListenerR21")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count().count()
    } catch { case _: Throwable => () }

    if (args.headOption.contains("joinAB")) {
      joinAB(spark, sfDir); spark.stop(); return
    }
    if (args.headOption.contains("store")) {
      storeCensus(spark, sfDir); spark.stop(); return
    }
    if (args.headOption.contains("merge1")) {
      mergeOne(spark, sfDir); spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_stream_event_window", "q_stream_join", "q_stream_join",
        "q_stream_forget", "q_stream_upsert", "q_stream_sessions",
        "q_stream_distinct", "q_stream_dedup", "q_stream_enrich",
        "q_stream_quality", "q_stream_content_gate",
        "q_stream_event_window")
    names.foreach { n =>
      progress.clear()
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $n%-28s $dt%7.3f s  rows=$c")
      progress.forEach(s => println(s"[probe]   $s"))
    }
    spark.stop()
  }

  /** One standalone mergeGeneration decomposed: every job's wall time,
    * stage count and task count, with call-site job descriptions.
    */
  private def mergeOne(spark: SparkSession, sfDir: String): Unit = {
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.flatMap(s =>
            s.details.linesIterator.filter(_.contains("graft")).take(1) ++
              Iterator(s.name)).distinct.mkString(" | ").take(200)
          starts.put(j.jobId,
            (System.nanoTime(), site, j.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, site, tasks) =>
            println(f"[probe] job ${j.jobId}%3d " +
              f"${(System.nanoTime() - t0) / 1e9}%7.3f s tasks=$tasks%3d  " +
              s"$site")
          }
        }
      })
    import org.apache.spark.sql.functions._
    // warm: one throwaway store
    val w = graft.engine.TempArtifacts.tempDir("graft-probe-warm")
    val batch0 = graft.engine.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"), lit(1L).as("n_versions"),
        pmod(col("user_id"), lit(VersionedStore.Buckets.toLong))
          .as("bucket"))
    VersionedStore.mergeGeneration(batch0, 0, w, commitTs = 1000L)
    println("[probe] ---- measured merge (gen 0 then gen 1) ----")
    val root = graft.engine.TempArtifacts.tempDir("graft-probe-merge1")
    var t0 = System.nanoTime()
    VersionedStore.mergeGeneration(batch0, 0, root, commitTs = 1000L)
    println(f"[probe] mergeGeneration gen0 total " +
      f"${(System.nanoTime() - t0) / 1e9}%7.3f s")
    t0 = System.nanoTime()
    VersionedStore.mergeGeneration(
      batch0.withColumn("last_value", col("last_value") + 1.0), 1, root,
      commitTs = 2000L)
    println(f"[probe] mergeGeneration gen1 total " +
      f"${(System.nanoTime() - t0) / 1e9}%7.3f s")
  }

  /** Job census over the store-family mouths: per-phase wall time + job
    * count + job descriptions, so the commit-machinery work is targeted.
    */
  private def storeCensus(spark: SparkSession, sfDir: String): Unit = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val desc = Option(j.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          jobLog.add(s"job ${j.jobId} stages=${j.stageInfos.size} " +
            s"tasks=${j.stageInfos.map(_.numTasks).sum} $desc")
        }
      })
    def t(label: String)(f: => Any): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
        f"  jobs=${jobs.get() - j0}%3d")
    }
    // warm the streaming/commit machinery on a throwaway store first
    t("q_stream_upsert (warm)") {
      graft.SparkEntry.queries("q_stream_upsert")(spark, sfDir).count() }
    t("q_change_feed (builds shared store)") {
      graft.SparkEntry.queries("q_change_feed")(spark, sfDir).count() }
    t("q_change_feed (store warm)") {
      graft.SparkEntry.queries("q_change_feed")(spark, sfDir).count() }
    t("q_store_vacuum (private store)") {
      graft.SparkEntry.queries("q_store_vacuum")(spark, sfDir).count() }
    t("q_store_delete") {
      graft.SparkEntry.queries("q_store_delete")(spark, sfDir).count() }
    t("q_concurrent_commit") {
      graft.SparkEntry.queries("q_concurrent_commit")(spark, sfDir).count() }
    t("q_store_restore") {
      graft.SparkEntry.queries("q_store_restore")(spark, sfDir).count() }
    t("q_index_forget") {
      graft.SparkEntry.queries("q_index_forget")(spark, sfDir).count() }
    println(s"[probe] --- job log tail (last 60) ---")
    val arr = jobLog.toArray(Array.empty[String])
    arr.takeRight(60).foreach(s => println(s"[probe]   $s"))
  }

  /** A/B the stream-stream join: state partition count x noDataMicroBatches. */
  private def joinAB(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val seq = new java.util.concurrent.atomic.AtomicLong(100)
    def run(parts: Int, noData: Boolean): (Double, Long) = {
      val table = s"graft_probe_join_${seq.incrementAndGet()}"
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noData.toString)
      val t0 = System.nanoTime()
      val clicks = EventStream.readEvents(s2, sfDir)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "14 days")
      val purchases = EventStream.readEvents(s2, sfDir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "14 days")
      val q = clicks.join(purchases,
          col("user_id") === col("p_user_id") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") +
              expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("user_id"), col("click_ts"),
          col("purchase_id"), col("purchase_ts"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
            .as("gap_us"))
        .writeStream.format("memory").queryName(table)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val n = s2.table(table).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warm once, then interleave variants
    run(25, noData = true)
    for (_ <- 0 until 3; (p, nd) <- Seq((25, true), (25, false),
        (7, true), (7, false), (4, false))) {
      val (dt, n) = run(p, nd)
      println(f"[probe] joinAB parts=$p%2d noData=$nd%5s  $dt%7.3f s  rows=$n")
    }
  }
}
