package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.engine.Tables

/** Engine robustness: every query survives empty inputs (0-row tables with
  * the real schemas) and concurrent execution in one session.
  */
class RobustnessSpec extends SparkSpec {

  /** An empty mirror of the fixture dir: same schemas, zero rows. */
  lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events: preserve the nanos-as-long raw layout expectations by writing
    // the normalized form; Tables.events falls through when ts is already
    // a timestamp
    Tables.events(spark, sf).limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** ML needs labeled rows; ANN/near-dup assume a 64-dim corpus — the
    * rest must handle empty inputs gracefully.
    */
  val emptyExclusions: Set[String] = Set("ml_train_eval", "ml_describe")

  test("every query runs on empty inputs without throwing") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!emptyExclusions(name)) {
        val n = fn(spark, emptyDir).count()
        assert(n >= 0, s"$name")
      }
    }
  }

  test("queries execute concurrently in one session") {
    val names = Seq("q_agg_multi", "q_pivot_dummies", "q_join_inner",
      "q_basetable_star", "q_text_quality", "q_window_running",
      "q_dedup_exact", "q_sessionize")
    val futures = names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, sf).count())
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.foreach { case (n, c) => assert(c > 0, s"$n empty") }
  }
}
