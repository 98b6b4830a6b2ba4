package graft

import org.apache.spark.sql.functions._
import graft.engine.MlSuite

/** ML pipeline smoke + threshold tests (SURVEY.md §5 item 4): the ML
  * surface is not oracle-checkable, so we assert separability, metric
  * sanity, and fixed-seed determinism (reference seed=7).
  */
class MlSpec extends SparkSpec {

  lazy val metrics: Map[(String, String, String), Double] =
    MlSuite.trainEval(spark, sf, Seq("lr", "rf", "gbt")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getDouble(3)).toMap

  test("all three classifiers clear AUC 0.9 on the held-out split") {
    Seq("lr", "rf", "gbt").foreach { m =>
      val auc = metrics((m, "test", "auc"))
      assert(auc > 0.9, s"$m test AUC $auc")
    }
  }

  test("per-class precision/recall/F1 are present and in [0,1]") {
    val keys = metrics.keySet.filter(_._3.startsWith("precision_"))
    assert(keys.nonEmpty)
    metrics.foreach { case ((_, _, _), v) => assert(v >= 0.0 && v <= 1.0) }
  }

  test("labeled basetable keeps one row per customer with binary label") {
    val bt = MlSuite.basetableLabeled(spark, sf)
    assert(bt.select("c_custkey").distinct().count() === bt.count())
    val labels = bt.select("label").distinct().collect()
      .map(_.getDouble(0)).toSet
    assert(labels.subsetOf(Set(0.0, 1.0)))
    assert(labels.contains(1.0), "no positive labels in fixture")
  }

  test("fixed seed makes the LR run reproducible") {
    val a = MlSuite.trainEval(spark, sf, Seq("lr")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val b = MlSuite.trainEval(spark, sf, Seq("lr")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(a.sameElements(b))
  }
}
