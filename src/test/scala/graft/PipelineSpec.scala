package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSuite {

  test("autoPipeline classifies event_type end to end") {
    val ev = Tables.events(spark, sf).drop("props") // free-text JSON excluded
      .withColumn("event_type",
        when(col("event_type") === "error", 1.0).otherwise(0.0))
    val r = Pipeline.autoPipeline(ev, "event_type")
    assert(r.task === "classification")
    assert(r.metrics("accuracy") >= 0.5) // majority class is ~80%
    assert(r.metrics("n_test") > 0)
    assert(r.train.count() + r.test.count() === ev.count())
    // model selection tried all three reference families (binary target)
    assert(r.modelMetrics.keySet === Set("RandomForest", "LogisticRegression", "GradientBoosting"))
    assert(r.modelMetrics(r.bestModel)("accuracy") ===
      r.modelMetrics.values.map(_("accuracy")).max)
  }

  test("autoPipeline regresses a price target end to end") {
    val li = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_tax", "l_returnflag", "l_extendedprice")
    val r = Pipeline.autoPipeline(li, "l_extendedprice")
    assert(r.task === "regression")
    assert(r.metrics("mse") >= 0)
    assert(r.metrics("r2") <= 1.0)
    assert(r.modelMetrics.keySet === Set("RandomForest", "GradientBoosting", "LinearRegression"))
    assert(r.modelMetrics(r.bestModel)("mse") === r.modelMetrics.values.map(_("mse")).min)
  }

  test("clean handles nulls, strings, and timestamps generically") {
    val ev = Tables.events(spark, sf)
      .withColumn("value", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .drop("props")
    val cleaned = Pipeline.clean(ev)
    // no nulls survive in value; event_type became numeric codes; ts expanded
    assert(cleaned.filter(col("value").isNull).count() === 0)
    assert(cleaned.schema("event_type").dataType.typeName === "double")
    assert(cleaned.columns.contains("ts_year") && !cleaned.columns.contains("ts"))
  }

  test("model persistence: saved model reloads and reproduces predictions") {
    import org.apache.spark.ml.classification.RandomForestClassificationModel
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    val ev = Tables.events(spark, sf).drop("props")
      .withColumn("event_type",
        when(col("event_type") === "error", 1.0).otherwise(0.0))
    val r = Pipeline.autoPipeline(ev, "event_type", saveDir = Some(dir))
    assert(r.modelPath.isDefined)
    assert(r.featureImportances.nonEmpty)
    // sums to 1 when the forest splits, 0 when the target is pure noise
    val impSum = r.featureImportances.map(_._2).sum
    assert(impSum >= 0 && impSum < 1.01)
    assert(r.featureImportances.forall(_._2 >= 0))
    val reloaded = RandomForestClassificationModel.load(r.modelPath.get)
    assert(reloaded.numFeatures === r.featureCols.length)
  }

  test("driver entry smoke: rows > 0 on a vanilla session") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
