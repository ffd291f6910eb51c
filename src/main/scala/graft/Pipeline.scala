package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's end-to-end `run_pipeline` (/root/reference/
  * main.py:390-485) re-expressed as a schema-driven, distributed
  * pipeline: clean → encode → feature-engineer → split → train →
  * evaluate, generic over ANY input DataFrame + target column.
  *
  * Differences from the pandas original, by design:
  * - imputation/quantile parameters come from approx sketches
  *   (single pass, bounded memory — exact medians don't scale);
  * - every step is a DataFrame transform: nothing is collected except
  *   the O(#columns) parameter row and the final metric row;
  * - train/test split is hash-based, not row-order-based.
  */
object Pipeline {

  case class Result(cleaned: DataFrame, train: DataFrame, test: DataFrame,
      task: String, metrics: Map[String, Double], featureCols: Seq[String],
      featureImportances: Seq[(String, Double)], modelPath: Option[String],
      bestModel: String, modelMetrics: Map[String, Map[String, Double]])

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** clean_data (main.py:66-129): drop all-null columns, detect
    * datetime-like string columns (≥90% parseable → converted),
    * median-impute + IQR-clip numerics, mode-impute + encode strings
    * (label if ≤32 distinct else frequency), expand timestamps into
    * calendar features.
    *
    * `noClip` columns are imputed but NOT outlier-clipped — pass the
    * target here: clipping a skewed 0/1 label (IQR = 0) would collapse
    * it to a constant. (The pandas reference clips every numeric
    * column including the target — a latent bug this port fixes.) */
  def clean(dfIn: DataFrame, noClip: Set[String] = Set.empty): DataFrame = {
    // one scan: per-column non-null counts + parse rate of string cols
    // (try_to_timestamp is ANSI-safe); the O(#columns) row is the only
    // thing collected
    val strCols0 = dfIn.schema.fields.filter(_.dataType == StringType).map(_.name)
    val probeAggs = dfIn.columns.map(c => count(col(c)).as(s"__nn_$c")) ++
      strCols0.map(c => count(expr(s"try_to_timestamp(`$c`)")).as(s"__ts_$c"))
    val probe = dfIn.agg(probeAggs.head, probeAggs.tail.toSeq: _*).head()
    def nn(c: String) = probe.getAs[Long](s"__nn_$c")
    val allNull = dfIn.columns.filter(nn(_) == 0L) // dropna(axis=1, how='all')
    val dateLike = strCols0.filter(c =>
      nn(c) > 0 && probe.getAs[Long](s"__ts_$c") >= nn(c) * 0.9 && !noClip.contains(c))
    val df = dateLike.foldLeft(dfIn.drop(allNull.toSeq: _*)) { (d, c) =>
      d.withColumn(c, expr(s"try_to_timestamp(`$c`)"))
    }

    val numCols = df.schema.fields.filter(f => isNumeric(f.dataType)).map(_.name)
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    val tsCols = df.schema.fields.filter(_.dataType == TimestampType).map(_.name)

    // one pass: median + quartiles for every numeric column
    val paramAggs = numCols.flatMap { c =>
      Seq(expr(s"approx_percentile($c, 0.5)").cast("double").as(s"__med_$c"),
        expr(s"approx_percentile($c, 0.25)").cast("double").as(s"__q1_$c"),
        expr(s"approx_percentile($c, 0.75)").cast("double").as(s"__q3_$c"))
    }
    val withNum = if (paramAggs.isEmpty) df else {
      val params = df.agg(paramAggs.head, paramAggs.tail.toSeq: _*)
      numCols.foldLeft(df.join(broadcast(params))) { (d, c) =>
        val imputed = coalesce(col(c).cast("double"), col(s"__med_$c"))
        if (noClip.contains(c)) d.withColumn(c, imputed)
        else {
          val lo = col(s"__q1_$c") - (col(s"__q3_$c") - col(s"__q1_$c")) * 1.5
          val hi = col(s"__q3_$c") + (col(s"__q3_$c") - col(s"__q1_$c")) * 1.5
          d.withColumn(c, least(greatest(imputed, lo), hi))
        }
      }.drop(params.columns.toSeq: _*)
    }

    // strings: mode-impute, then label- or frequency-encode
    val withStr = strCols.foldLeft(withNum) { (d, c) =>
      val counts = d.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
      val mode = counts.orderBy(col("__cnt").desc, col(c)).limit(1)
        .select(col(c).as("__mode"))
      val filled = d.join(broadcast(mode))
        .withColumn(c, coalesce(col(c), col("__mode"))).drop("__mode")
      val nDistinct = counts.count()
      if (nDistinct <= 32) {
        val codes = counts.select(col(c))
          .withColumn("__code", (row_number().over(Window.orderBy(col(c))) - 1).cast("double"))
        filled.join(broadcast(codes), Seq(c)).withColumn(c, col("__code")).drop("__code")
      } else {
        val freqs = counts.select(col(c), col("__cnt").cast("double").as("__freq"))
        filled.join(broadcast(freqs), Seq(c)).withColumn(c, col("__freq")).drop("__freq")
      }
    }

    // timestamps → calendar features (main.py:107-118), drop original
    tsCols.foldLeft(withStr) { (d, c) =>
      d.withColumn(s"${c}_year", year(col(c)).cast("double"))
        .withColumn(s"${c}_month", month(col(c)).cast("double"))
        .withColumn(s"${c}_day", dayofmonth(col(c)).cast("double"))
        .withColumn(s"${c}_hour", hour(col(c)).cast("double"))
        .withColumn(s"${c}_dow", (weekday(col(c)) + 1).cast("double"))
        .drop(c)
    }
  }

  /** train_model (main.py:194-385): task detection, split, RF fit,
    * metric computation — all on the cleaned frame. */
  def autoPipeline(df: DataFrame, target: String, seed: Long = 42L,
      saveDir: Option[String] = None): Result = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}
    import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}

    val cleaned = clean(df, noClip = Set(target))
    require(cleaned.columns.contains(target), s"target $target not found after cleaning")
    val featureCols = cleaned.columns.filter(_ != target).toSeq
    require(featureCols.nonEmpty, "no feature columns")

    val nDistinct = cleaned.select(target).distinct().count()
    val task = if (nDistinct < 20) "classification" else "regression"

    val Array(train, test) = cleaned.na.fill(0.0)
      .withColumn("__r", pmod(xxhash64(struct(featureCols.map(col): _*)), lit(100L)))
      .randomSplitOn80_20()
    // Imbalance handling (main.py:232-263): when the minority class is
    // <20% of the majority, oversample the training split with SMOTE
    // AND weight classes in the estimators — both, like the reference.
    import graft.operators.MLPrep
    val imbalanced = task == "classification" && MLPrep.isImbalanced(train, target)
    val trainBalanced = if (imbalanced) {
      val counts = train.groupBy(col(target)).count().collect() // O(classes)
      val minRow = counts.minBy(_.getLong(1))
      val copies = math.min(5,
        (counts.map(_.getLong(1)).max / math.max(1L, minRow.getLong(1))).toInt - 1)
      val smoted = if (copies >= 1)
        train.unionByName(MLPrep.smoteOversample(train, target, featureCols, minRow.get(0), copies))
      else train
      MLPrep.withClassWeights(smoted, target)
    } else train.withColumn("class_weight", lit(1.0))

    val asm = new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("features").setHandleInvalid("keep")
    val trainA = asm.transform(trainBalanced).cache()
    val testA = asm.transform(test).cache()

    def clsMetrics(pred: DataFrame): Map[String, Double] = {
      val n = pred.count().toDouble
      Map("accuracy" -> pred.filter(col("prediction") === col(target)).count() / n,
        "n_test" -> n)
    }
    def regMetrics(pred: DataFrame): Map[String, Double] = {
      val row = pred.agg(
        count(lit(1)).cast("double").as("n"),
        sum(pow(col("prediction") - col(target), 2)).as("ssres"),
        sum(abs(col("prediction") - col(target))).as("sabs"),
        sum(col(target)).as("sy"),
        sum(col(target) * col(target)).as("syy")).head()
      val (n, ssres, sabs, sy, syy) =
        (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4))
      Map("mse" -> ssres / n, "mae" -> sabs / n,
        "r2" -> (1.0 - ssres / (syy - sy * sy / n)), "n_test" -> n)
    }

    // Model selection (main.py:269-301/319-350): fit the reference's
    // three families, evaluate each on the held-out split, keep the
    // best (classification: accuracy ↑; regression: MSE ↓).
    case class Fitted(name: String, metrics: Map[String, Double],
        importances: Seq[(String, Double)], save: String => Unit)
    val candidates: Seq[Fitted] =
      if (task == "classification") {
        val rf = new RandomForestClassifier().setNumTrees(20).setMaxDepth(6).setSeed(seed)
          .setWeightCol("class_weight")
          .setLabelCol(target).setFeaturesCol("features").fit(trainA)
        val lr = new LogisticRegression().setMaxIter(50)
          .setWeightCol("class_weight")
          .setLabelCol(target).setFeaturesCol("features").fit(trainA)
        val gbt = if (nDistinct == 2)
          Some(new GBTClassifier().setMaxIter(20).setMaxDepth(5).setSeed(seed)
            .setWeightCol("class_weight")
            .setLabelCol(target).setFeaturesCol("features").fit(trainA))
        else None // GBTClassifier is binary-only
        Seq(
          Fitted("RandomForest", clsMetrics(rf.transform(testA)),
            featureCols.zip(rf.featureImportances.toArray), d => rf.write.overwrite().save(d)),
          Fitted("LogisticRegression", clsMetrics(lr.transform(testA)),
            normalizedCoefs(featureCols, lr.coefficientMatrix.toArray),
            d => lr.write.overwrite().save(d))) ++
          gbt.map(m => Fitted("GradientBoosting", clsMetrics(m.transform(testA)),
            featureCols.zip(m.featureImportances.toArray), d => m.write.overwrite().save(d)))
      } else {
        val rf = new RandomForestRegressor().setNumTrees(20).setMaxDepth(6).setSeed(seed)
          .setLabelCol(target).setFeaturesCol("features").fit(trainA)
        val gbt = new GBTRegressor().setMaxIter(20).setMaxDepth(5).setSeed(seed)
          .setLabelCol(target).setFeaturesCol("features").fit(trainA)
        val lin = new LinearRegression().setMaxIter(50)
          .setLabelCol(target).setFeaturesCol("features").fit(trainA)
        Seq(
          Fitted("RandomForest", regMetrics(rf.transform(testA)),
            featureCols.zip(rf.featureImportances.toArray), d => rf.write.overwrite().save(d)),
          Fitted("GradientBoosting", regMetrics(gbt.transform(testA)),
            featureCols.zip(gbt.featureImportances.toArray), d => gbt.write.overwrite().save(d)),
          Fitted("LinearRegression", regMetrics(lin.transform(testA)),
            normalizedCoefs(featureCols, lin.coefficients.toArray), d => lin.write.overwrite().save(d)))
      }
    val best =
      if (task == "classification") candidates.maxBy(_.metrics("accuracy"))
      else candidates.minBy(_.metrics("mse"))
    val path = saveDir.map { d => best.save(s"$d/model"); s"$d/model" }
    trainA.unpersist(); testA.unpersist()
    Result(cleaned, train, test, task, best.metrics, featureCols,
      best.importances.sortBy(-_._2), path,
      best.name, candidates.map(c => c.name -> c.metrics).toMap)
  }

  /** generate_visualizations (main.py:134-189) as DATA, generic over
    * any frame: the aggregates a chart layer would render. Everything
    * is one or two scans; nothing is collected.
    * - overview: 1 row (n_rows, n_cols)
    * - target distribution: value counts if ≤20 distinct, else a
    *   20-bucket histogram (same rule as the reference)
    * - corr matrix: pairwise Pearson over up to 10 numeric columns
    * - histograms: 20 buckets for up to 5 numeric columns (long form)
    */
  case class VizData(overview: DataFrame, targetDistribution: DataFrame,
      corrMatrix: DataFrame, histograms: DataFrame)

  def vizData(df: DataFrame, target: String): VizData = {
    import df.sparkSession.implicits._
    val numCols = df.schema.fields.filter(f => isNumeric(f.dataType)).map(_.name)

    val overview = Seq((df.count(), df.columns.length.toLong)).toDF("n_rows", "n_cols")

    val targetDist =
      if (df.select(target).distinct().count() <= 20)
        df.groupBy(col(target).cast("string").as("value"))
          .agg(count(lit(1)).as("n")).orderBy(col("n").desc, col("value"))
      else histogram(df, target, 20)

    val corrCols = numCols.take(10)
    val corrMatrix = {
      val pairs = for { i <- corrCols.indices; j <- corrCols.indices if i < j }
        yield (corrCols(i), corrCols(j))
      if (pairs.isEmpty) Seq.empty[(String, String, Double)].toDF("col_a", "col_b", "corr")
      else {
        // try_divide: a constant column (zero variance — e.g. IQR-clipped
        // to one value) yields null corr instead of an ANSI
        // divide-by-zero error
        val aggs = pairs.map { case (a, b) =>
          expr(s"try_divide(covar_samp(`$a`, `$b`), stddev_samp(`$a`) * stddev_samp(`$b`))")
            .as(s"${a}__$b") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = pairs.map { case (a, b) =>
          struct(lit(a).as("col_a"), lit(b).as("col_b"),
            round(col(s"${a}__$b"), 6).as("corr")) }
        one.select(explode(array(rows: _*)).as("p")).select("p.*")
      }
    }

    val hists = numCols.take(5).map(c => histogram(df, c, 20)
        .select(lit(c).as("col_name"), col("bucket"), col("n")))
      .reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(String, Long, Long)].toDF("col_name", "bucket", "n"))

    VizData(overview, targetDist, corrMatrix, hists)
  }

  /** Fixed-width histogram of any numeric column. */
  def histogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    val mm = df.agg(min(col(c)).cast("double").as("mn"), max(col(c)).cast("double").as("mx"))
    df.join(broadcast(mm))
      .withColumn("bucket",
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          least(floor((col(c) - col("mn")) / ((col("mx") - col("mn")) / buckets)),
            lit(buckets - 1L))))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Linear-model "importances": |coefficient| normalized to sum 1
    * (multiclass matrices flatten to per-class blocks; sum per
    * feature across classes). */
  private def normalizedCoefs(names: Seq[String], coefs: Array[Double]): Seq[(String, Double)] = {
    val per = names.indices.map(i =>
      coefs.indices.filter(_ % names.length == i).map(k => math.abs(coefs(k))).sum)
    val tot = per.sum
    names.zip(if (tot > 0) per.map(_ / tot) else per)
  }

  /** Deterministic hash split helper (keeps Result API tidy). */
  implicit private class SplitOps(df: DataFrame) {
    def randomSplitOn80_20(): Array[DataFrame] = Array(
      df.filter(col("__r") >= 20).drop("__r"),
      df.filter(col("__r") < 20).drop("__r"))
  }
}
