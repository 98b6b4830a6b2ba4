package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY round-20 measurement probe (deleted before the round
  * closes): decomposes the versioned-store ingest the store family
  * pays — spool synthesis, streaming replay, per-phase ntile cost —
  * so the optimization targets measured time, not guesses.
  */
object ProbeR20 {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    // per-phase job census
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, System.nanoTime()): Unit
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          jobs.incrementAndGet()
          Option(starts.remove(e.jobId)).foreach(t0 =>
            jobMs.addAndGet((System.nanoTime() - t0) / 1000000L): Unit)
        }
      })
    def marked[A](label: String)(f: => A): A = {
      val (j0, m0) = (jobs.get(), jobMs.get())
      val r = t(label)(f)
      Thread.sleep(50)
      println(f"[probe]   ^ jobs=${jobs.get() - j0}%3d jobMs=${jobMs.get() - m0}%6d")
      r
    }
    // warm-up
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_name").count().count()

    // --- pagerank regime A/B: lazy unrolled (current, iters=3) vs
    // checkpointed loop (the iters>3 regime forced at 3)
    import org.apache.spark.sql.functions.{col, concat, lit, count, sum, expr}
    def prEdges = {
      val e0 = graft.engine.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.engine.Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    }
    def prRun(truncate: Boolean): Long = {
      val edges = prEdges
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val eDeg0 = edges.join(deg, "src")
      val eDeg = if (truncate) eDeg0.localCheckpoint() else eDeg0
      def round(ranks: org.apache.spark.sql.DataFrame) =
        eDeg.join(ranks, eDeg("src") === ranks("node"))
          .select(col("dst"), expr("pr DIV deg").as("contrib"))
          .groupBy("dst").agg(sum(col("contrib")).as("in_sum"))
          .select(col("dst").as("node"),
            expr("CAST(150000 + (85 * in_sum) DIV 100 AS BIGINT)").as("pr"))
      var ranks = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
      for (_ <- 1 to 3) {
        ranks = round(ranks)
        if (truncate) ranks = ranks.localCheckpoint()
      }
      ranks.count()
    }
    t("pagerank lazy-unroll (warm 1)") { prRun(false) }
    t("pagerank lazy-unroll (warm 2)") { prRun(false) }
    t("pagerank checkpointed loop")    { prRun(true) }
    t("pagerank checkpointed loop 2")  { prRun(true) }
    spark.stop()
  }
}
