package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import graft.functions.TextFunctions._

/** Trained document-quality classifier — the fastText-shape model
  * (Joulin et al. 2016: bag of hashed n-grams → linear classifier)
  * that GPT-3/LLaMA-class pipelines run as their quality gate, where
  * the t2 heuristic is the bootstrap. The shape matters more than the
  * weights: hashed unigram+bigram counts (the hashing TRICK — no
  * vocabulary fit pass, so the featurizer is stateless and new tokens
  * at inference can't break it, m19's argument) feed MLlib
  * LogisticRegression; scoring is one map-side transform.
  *
  * Scale: featurization is per-row (tokens + bigrams + HashingTF —
  * no shuffle, no fit); LR training is MLlib's treeAggregate over the
  * SEED (small by construction — you label thousands, not billions);
  * scoring the 100 TB corpus is embarrassingly parallel. This is why
  * the trained gate deploys where a crawl-wide TF-IDF can't: nothing
  * about the model grows with the corpus.
  *
  * Training labels come from the caller: known-good vs known-bad
  * seed corpora (the GPT-3 WebText-vs-CommonCrawl pattern), or a
  * heuristic-labeled seed (distilling t2 into a model that
  * generalizes to signals the heuristic's ratios can't see —
  * [[graft.operators.TextOps.t20]]'s audit form).
  */
object QualityClassifier {

  /** A trained gate: the LR model plus the featurizer config it was
    * trained under (dim must match at scoring time). */
  final case class Model(lr: LogisticRegressionModel, dim: Int)

  /** Hashed unigram+bigram count features — the fastText featurizer.
    * Pure map-side: `dim`-bucket HashingTF over tokens ++ bigrams.
    * Adds `features`; leaves the input columns untouched. */
  def featurize(df: DataFrame, textCol: String, dim: Int = 4096): DataFrame = {
    val terms = df.withColumn("__terms",
      concat(tokens(col(textCol)), shinglesAllK(tokens(col(textCol)), 2)))
    new HashingTF().setInputCol("__terms").setOutputCol("features")
      .setNumFeatures(dim)
      .transform(terms).drop("__terms")
  }

  /** Fit the gate on a labeled seed (`labelCol`: 0.0/1.0 doubles).
    * L2-regularized LBFGS — deterministic for a fixed seed frame. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      dim: Int = 4096, maxIter: Int = 50, regParam: Double = 0.01): Model = {
    val feats = featurize(labeled, textCol, dim)
      .select(col(labelCol).cast("double").as("label"), col("features"))
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("label").setFeaturesCol("features")
    Model(lr.fit(feats), dim)
  }

  /** Persist a trained gate: the LR coefficients via MLlib's writer
    * (api.py:111-136's joblib-dump analogue) plus the featurizer dim
    * as a 1-row parquet sidecar — scoring with a dim other than the
    * training dim silently hashes terms into different buckets, so
    * the dim is part of the artifact, not a caller argument.
    * Round-trip is spec'd score-identical (ArtifactsSpec); reload
    * with [[load]] or thread a path through
    * [[Corpus.Config.qualityModelPath]]. */
  def save(s: org.apache.spark.sql.SparkSession, model: Model, path: String): Unit = {
    model.lr.write.overwrite().save(s"$path/lr")
    import s.implicits._
    Seq(model.dim).toDF("dim").write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a [[save]]d gate, ready to [[score]]. */
  def load(s: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(LogisticRegressionModel.load(s"$path/lr"),
      s.read.parquet(s"$path/meta").select("dim").head().getInt(0))

  /** Score a corpus: adds `q_prob` (P(label=1) — the quality score a
    * curation gate thresholds) and `q_pred` (0/1 at 0.5). One
    * map-side transform; every input column passes through. */
  def score(model: Model, docs: DataFrame, textCol: String): DataFrame =
    model.lr.transform(featurize(docs, textCol, model.dim))
      .withColumn("q_prob", vector_to_array(col("probability"))(1))
      .withColumn("q_pred", col("prediction").cast("long"))
      .drop("features", "rawPrediction", "probability", "prediction")
}
