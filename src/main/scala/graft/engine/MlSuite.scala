package graft.engine

import org.apache.spark.ml.{Pipeline => MlPipeline}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.feature.{OneHotEncoder, RFormula, StringIndexer, UnivariateFeatureSelector}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.mllib.evaluation.{BinaryClassificationMetrics, MulticlassMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ML surface (SURVEY.md §2.9 M1–M12) re-hosted on the
  * synthetic basetable: StringIndexer×2 → OneHotEncoder → RFormula →
  * chi-square percentile feature selection → {LogisticRegression,
  * RandomForest, GBT} → AUC / per-class precision-recall-F1.
  *
  * Label analog (FIXTURES.md §C): "did the customer produce a purchase
  * event" stands in for "did the business start delivery/takeout". Not
  * DuckDB-expressible — validated by smoke/threshold ScalaTests (SURVEY §5
  * item 4); the `ml_train_eval` query returns a metrics table (rows-only
  * driver check).
  *
  * Reference fidelity: split 70/30 seed 7 (`Databricks Notebook.py:737`),
  * LR maxIter=10 regParam=0.01 (NB:805), RF numTrees=50 (NB:873), GBT
  * defaults (NB:941), ChiSqSelector percentile=0.9 (NB:775) via Spark 4's
  * UnivariateFeatureSelector (SURVEY §7.5 risk 4).
  */
object MlSuite {
  type Q = (SparkSession, String) => DataFrame

  val Seed = 7L

  /** Basetable + binary label, ML-typed: strings→categoricals kept for the
    * indexers, decimal→double, count nulls already filled by the star.
    */
  def basetableLabeled(spark: SparkSession, dir: String): DataFrame = {
    val base = Pipeline.basetableStar(spark, dir)
    val purchasers = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("c_custkey")).distinct()
      .withColumn("label", lit(1.0))
    base.join(purchasers, Seq("c_custkey"), "left")
      .withColumn("label", coalesce(col("label"), lit(0.0)))
      .withColumn("total_spend",
        coalesce(col("total_spend").cast("double"), lit(0.0)))
      .withColumn("avg_event_value", coalesce(col("avg_event_value"), lit(0.0)))
      .drop("last_order", "c_name")
  }

  /** M1–M3: categorical encoding pipeline (city/state analog =
    * c_mktsegment/n_name), then drop the raw/indexed intermediates —
    * mirroring the reference's manual encode-then-model flow.
    */
  def encodeCategoricals(df: DataFrame): DataFrame = {
    val idx1 = new StringIndexer().setInputCol("c_mktsegment")
      .setOutputCol("seg_idx").setHandleInvalid("keep")
    val idx2 = new StringIndexer().setInputCol("n_name")
      .setOutputCol("nat_idx").setHandleInvalid("keep")
    val ohe = new OneHotEncoder()
      .setInputCols(Array("seg_idx", "nat_idx"))
      .setOutputCols(Array("seg_vec", "nat_vec"))
    new MlPipeline().setStages(Array(idx1, idx2, ohe))
      .fit(df).transform(df)
      .drop("c_mktsegment", "n_name", "seg_idx", "nat_idx")
  }

  /** Full fit/eval for one classifier; returns (model, dataset, metric,
    * value) rows. Metrics computed through the reference's RDD path
    * (BinaryClassificationMetrics / MulticlassMetrics,
    * `Databricks Notebook.py:836–862`).
    */
  private def evalModel(name: String, preds0: DataFrame,
      dataset: String): Seq[(String, String, String, Double)] = {
    // cache: the two RDD projections + the multi-pass metric classes would
    // otherwise re-execute the whole transform pipeline per metric job
    val preds = preds0
      .select(col("probability"), col("prediction"), col("label")).cache()
    try {
      val scoreAndLabel = preds.rdd
        .map(r => (r.getAs[Vector](0)(1), r.getDouble(2)))
      val predAndLabel = preds.rdd
        .map(r => (r.getDouble(1), r.getDouble(2)))
      val bin = new BinaryClassificationMetrics(scoreAndLabel)
      val mc = new MulticlassMetrics(predAndLabel)
      val labels = Seq(0.0, 1.0)
      Seq((name, dataset, "auc", bin.areaUnderROC()),
        (name, dataset, "accuracy", mc.accuracy),
        (name, dataset, "weighted_f1", mc.weightedFMeasure)) ++
        labels.flatMap { l =>
          Seq((name, dataset, s"precision_$l", mc.precision(l)),
            (name, dataset, s"recall_$l", mc.recall(l)),
            (name, dataset, s"f1_$l", mc.fMeasure(l, 1.0)))
        }
    } finally preds.unpersist()
  }

  /** M4–M6: formula assembly, seeded split, chi2-percentile selection —
    * returns the selected (train, test) feature frames.
    */
  def prepare(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val encoded = encodeCategoricals(basetableLabeled(spark, dir))
    val rf = new RFormula().setFormula("label ~ . - c_custkey")
      .setFeaturesCol("features").setLabelCol("label")
    // materialize once: the selector fit, both selection transforms, and
    // every classifier iteration would otherwise re-run the whole
    // star-join + encode + formula chain
    val formed = rf.fit(encoded).transform(encoded)
      .select("c_custkey", "features", "label").cache()
    val Array(train, test) =
      formed.randomSplit(Array(0.7, 0.3), seed = Seed)
    // ChiSqSelector's Spark-4 successor. The reference ran chi2 over an
    // (almost) all-dummy matrix; our matrix mixes one-hot dummies with
    // continuous counts/amounts, and chi2 hard-fails past 10k distinct
    // feature values (hit at sf0.1) — featureType "continuous" selects the
    // ANOVA F-test, which is the correct statistic for this matrix and
    // scale-safe (0/1 dummies are valid continuous inputs to it).
    val selector = new UnivariateFeatureSelector()
      .setFeatureType("continuous").setLabelType("categorical")
      .setSelectionMode("percentile").setSelectionThreshold(0.9)
      .setFeaturesCol("features").setOutputCol("selectedFeatures")
      .setLabelCol("label")
    val selModel = selector.fit(train)
    def sel(df: DataFrame): DataFrame = selModel.transform(df)
      .drop("features").withColumnRenamed("selectedFeatures", "features")
    (sel(train), sel(test))
  }

  /** M10 — model introspection: LR coefficients/intercept and RF feature
    * importances as a tidy (model, term, value) table (`Databricks
    * Notebook.py:813–823, 879–893`).
    */
  def describeModel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (train, _) = prepare(spark, dir)
    val lrm = new LogisticRegression().setMaxIter(10).setRegParam(0.01)
      .fit(train)
    val rfm = new RandomForestClassifier().setNumTrees(50).setSeed(Seed)
      .fit(train)
    val rows =
      lrm.coefficients.toArray.zipWithIndex.map { case (c, i) =>
        ("lr", s"coef_$i", c)
      }.toSeq :+ (("lr", "intercept", lrm.intercept)) :++
        rfm.featureImportances.toArray.zipWithIndex.map { case (v, i) =>
          ("rf", s"importance_$i", v)
        }
    rows.toDF("model", "term", "value")
      .withColumn("value", round(col("value"), 6))
  }

  /** M4–M12 end to end. `models` selects which classifiers run (the
    * Verify/Bench query uses LR only; tests run all three).
    */
  def trainEval(spark: SparkSession, dir: String,
      models: Seq[String]): DataFrame = {
    import spark.implicits._
    val (trainS0, testS) = prepare(spark, dir)
    val trainS = trainS0.cache()
    val classifiers = Map(
      "lr" -> new LogisticRegression()
        .setMaxIter(10).setRegParam(0.01),
      "rf" -> new RandomForestClassifier()
        .setNumTrees(50).setSeed(Seed),
      "gbt" -> new GBTClassifier().setSeed(Seed))
    val rows = models.flatMap { m =>
      val model = classifiers(m).fit(trainS)
      evalModel(m, model.transform(trainS), "train") ++
        evalModel(m, model.transform(testS), "test")
    }
    trainS.unpersist()
    rows.toDF("model", "dataset", "metric", "value")
      .withColumn("value", round(col("value"), 4))
  }

  def mlTrainEval(spark: SparkSession, dir: String): DataFrame =
    trainEval(spark, dir, Seq("lr"))

  val queries: Map[String, Q] = Map(
    "ml_train_eval" -> mlTrainEval _)

  /** Not DuckDB-expressible — no oracle entries (driver rows-only check). */
  val oracles: Map[String, String] = Map.empty
}
