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

  test("clean drops all-null columns and detects datetime strings") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-02 03:04:05", "x", 1.0),
      (2L, "2024-02-03 04:05:06", "y", 2.0),
      (3L, "2024-03-04 05:06:07", "x", 3.0))
      .toDF("id", "when_str", "cat", "v")
      .withColumn("ghost", lit(null).cast("double"))
    val cleaned = Pipeline.clean(df)
    assert(!cleaned.columns.contains("ghost")) // dropna(axis=1, how='all')
    assert(cleaned.columns.contains("when_str_year") && !cleaned.columns.contains("when_str"))
    assert(cleaned.select("when_str_year").distinct().head().getDouble(0) === 2024.0)
    assert(cleaned.schema("cat").dataType.typeName === "double") // label-encoded
  }

  test("stratified split keeps exact per-class test fractions") {
    import graft.operators.MLPrep
    val ev = Tables.events(spark, sf)
    val split = MLPrep.stratifiedSplit(ev, "event_type", 0.2)
    val frac = split.groupBy("event_type")
      .agg((sum(when(col("split") === "test", 1)) / count(lit(1))).as("f"))
      .collect().map(_.getAs[Double]("f"))
    assert(frac.forall(f => math.abs(f - 0.2) < 0.01))
  }

  test("SMOTE oversampling synthesizes in-range minority rows") {
    import graft.operators.MLPrep
    val ev = Tables.events(spark, sf).drop("props", "ts")
    val before = ev.filter(col("event_type") === "error").count()
    val synth = MLPrep.smoteOversample(ev, "event_type", Seq("value"), "error", 2)
    assert(synth.count() >= (before - 1) * 2) // 2 copies per seed (last seed has no neighbor)
    assert(synth.select("event_type").distinct().head().getString(0) === "error")
    val mm = ev.filter(col("event_type") === "error")
      .agg(min("value"), max("value")).head()
    val bad = synth.filter(col("value") < mm.getDouble(0) - 1e-9 ||
      col("value") > mm.getDouble(1) + 1e-9).count()
    assert(bad === 0) // interpolation stays inside the class hull
  }

  test("imbalanced classification triggers SMOTE + class weights and still trains") {
    import spark.implicits._
    // 4% positives → ratio < 0.2 → imbalance path
    val df = (1 to 2000).map(i => (i.toLong, (i % 97).toDouble, (i % 13).toDouble,
      if (i % 25 == 0) 1.0 else 0.0)).toDF("id", "f1", "f2", "label")
    val r = Pipeline.autoPipeline(df, "label")
    assert(r.task === "classification")
    assert(r.modelMetrics.nonEmpty)
    assert(r.metrics("accuracy") > 0)
  }

  test("driver entry smoke: rows > 0 on a vanilla session") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("HTML report renders all reference sections for classification and regression") {
    // classification dataset
    val ev = Tables.events(spark, sf).drop("props")
      .withColumn("event_type",
        when(col("event_type") === "error", 1.0).otherwise(0.0))
    val rc = Pipeline.autoPipeline(ev, "event_type")
    val htmlC = Report.render(Pipeline.vizData(rc.cleaned, "event_type"), Some(rc))
    // regression dataset
    val li = Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_tax", "l_returnflag", "l_extendedprice")
    val rr = Pipeline.autoPipeline(li, "l_extendedprice")
    val htmlR = Report.render(Pipeline.vizData(rr.cleaned, "l_extendedprice"), Some(rr))
    for ((html, res) <- Seq((htmlC, rc), (htmlR, rr))) {
      for (section <- Seq("id=\"overview\"", "id=\"distribution\"", "id=\"correlation\"",
          "id=\"histograms\"", "id=\"metrics\"", "id=\"importances\"")) {
        assert(html.contains(section), s"missing $section")
      }
      assert(html.contains(res.bestModel))
      assert(html.contains("<svg")) // charts actually rendered
      res.metrics.keys.foreach(k => assert(html.contains(k)))
    }
    assert(htmlC.contains("classification") && htmlR.contains("regression"))
  }

  test("reference parity end to end: xlsx upload -> pipeline job -> HTML report") {
    import graft.sources.{Excel, Ingest}
    // the reference's complete user journey (api.py): upload an .xlsx,
    // run the pipeline in the background, download the report
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val upload = s"$dir/upload.xlsx"
    Excel.write(
      Tables.orders(spark, sf).limit(500)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      upload)
    val df = Ingest.normalizeColumns(Ingest.readExcel(spark, upload))
    val id = Jobs.submit(df, "o_totalprice", reportDir = Some(dir))
    val fin = Jobs.await(id)
    assert(fin.isInstanceOf[Jobs.Done], s"job ended as $fin: ${Jobs.error(id)}")
    assert(Jobs.result(id).exists(_.task == "regression"))
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(Jobs.reportPath(id).get)), "UTF-8")
    assert(html.contains("id=\"overview\"") && html.contains("id=\"metrics\""))
    assert(html.contains("500 rows"))
  }

  test("job runner: submit -> status -> done with a report artifact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jobs").toString
    val ev = Tables.events(spark, sf).drop("props")
      .withColumn("event_type",
        when(col("event_type") === "error", 1.0).otherwise(0.0))
    val id = Jobs.submit(ev, "event_type", reportDir = Some(dir))
    assert(Jobs.status(id).exists(s => s == "queued" || s == "running"))
    val fin = Jobs.await(id)
    assert(fin.isInstanceOf[Jobs.Done], s"job ended as $fin: ${Jobs.error(id)}")
    assert(Jobs.result(id).exists(_.task == "classification"))
    val report = Jobs.reportPath(id)
    assert(report.isDefined)
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(report.get)) > 1000)
    // failed jobs surface their error instead of hanging
    val bad = Jobs.submit(ev.limit(0), "event_type")
    val finBad = Jobs.await(bad)
    assert(finBad.isInstanceOf[Jobs.Failed])
    assert(Jobs.error(bad).isDefined)
  }
}
