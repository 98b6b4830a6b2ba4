package graft.streaming

import org.apache.spark.sql.SparkSession

/** TEMPORARY round-20 targeted mini-bench (deleted before the round
  * closes): replays Bench's exact methodology (same session config,
  * same warm-ups, sorted order, count() action) over a NAMED subset of
  * queries, for before/after comparisons without the full 250-key
  * sweep.
  */
object MiniBenchR20 {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count().count()
    } catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq.sorted
      else graft.SparkEntry.queries.keys.toSeq.sorted
    // MINI_REPEAT=n: run the whole sorted list n times, clearing the
    // session cache between sweeps, so later sweeps time the warm-JIT
    // steady state the full 250-key bench approximates
    val repeat = sys.env.get("MINI_REPEAT").flatMap(s =>
      scala.util.Try(s.toInt).toOption).getOrElse(1)
    val all = graft.SparkEntry.queries
    (1 to repeat).foreach { sweep =>
      if (sweep > 1) spark.catalog.clearCache()
      var total = 0.0
      names.foreach { name =>
        val t0 = System.nanoTime()
        val ok = try { all(name)(spark, sfDir).count(); true }
          catch { case t: Throwable =>
            System.err.println(s"[mini] $name FAILED: ${t.getMessage}")
            false }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) { total += dt; println(f"[mini:$sweep] $name%-36s $dt%8.3f s") }
        else println(f"[mini:$sweep] $name%-36s   FAIL")
      }
      println(f"[mini:$sweep] TOTAL ${names.size} queries $total%8.3f s")
    }
    spark.stop()
  }
}
