package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** End-to-end corpus curation — the composed pipeline an LLM
  * training-data build runs over raw documents (the shape of CCNet /
  * Dolma-style curation), assembled from this library's own operators:
  *
  *  1. min_tokens      whitespace-token floor (t1's counter)
  *  2. quality         t2's heuristic ≥ threshold
  *  3. language        t3's marker language-ID == cfg.lang
  *  4. exact_dedup     d1's md5 keep-min, among stage-3 survivors
  *  5. near_dedup      d3's minhash-LSH candidates → shingle-Jaccard ≥ τ
  *                     verify → d7's connected components → keep minima
  *  6. decontaminated  d6's word-k-gram overlap vs a held-out eval set
  *  7. sampled         m15's integer-hash threshold, capped per source
  *
  * Scale shape: the row-local stages (1-3) are boolean flags computed
  * in ONE map-side pass; the corpus-level stages (4-6) are the same
  * bucket-join shapes their operators use (hash-groupBy on md5, banded
  * LSH self-join with bucket caps, n-gram equi-join with a bloom
  * pre-filter) joined back as flags; the attrition report is ONE
  * aggregation of cumulative-survivor counts; `kept` is one filter.
  * Nothing is collected; every per-row decision is local after
  * broadcast-sized joins.
  *
  * Flags are CUMULATIVE (`f_quality` means "passed tokens AND
  * quality"), and each corpus-level stage only considers survivors of
  * the previous stages — a filtered-out duplicate can't absorb a
  * keep-slot from a surviving one.
  */
object Corpus {

  /** Curation thresholds. `evalSet` needs the same text/id columns as
    * the corpus; `samplePerSource` caps each source's contribution
    * (expected count; hash thresholding is target ± binomial). */
  final case class Config(
      minTokens: Long = 5,
      minQuality: Double = 0.2,
      lang: Option[String] = Some("en"),
      nearDupTau: Double = 0.9,
      evalSet: Option[DataFrame] = None,
      ngramK: Int = 5,
      samplePerSource: Option[Long] = None)

  /** `kept` = curated corpus (original columns); `flagged` = every
    * input row with its cumulative stage flags (audit trail);
    * `report` = (stage, surviving) attrition counts. */
  final case class Result(kept: DataFrame, flagged: DataFrame, report: DataFrame)

  def curate(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      sourceCol: String = "source", cfg: Config = Config()): Result = {
    val id = col(idCol)

    // stages 1-3: row-local flags, one pass
    val f1 = size(tokens(col(textCol))).cast("long") >= cfg.minTokens
    val f2 = qualityScore(col(textCol)) >= cfg.minQuality
    val f3 = cfg.lang.map(l => predLang(col(textCol)) === l).getOrElse(lit(true))
    val flagged0 = docs
      .withColumn("f_tokens", f1)
      .withColumn("f_quality", col("f_tokens") && f2)
      .withColumn("f_lang", col("f_quality") && f3)

    // stage 4: exact dedup among row-local survivors — one shuffle on
    // the 16-byte md5, keep-min id, flag joined back on the hash
    val exactKeep = flagged0.filter(col("f_lang"))
      .select(md5(col(textCol)).as("__h"), id.as("__kid"))
      .groupBy(col("__h")).agg(min(col("__kid")).as("__keep"))
    val flagged1 = flagged0.withColumn("__h", md5(col(textCol)))
      .join(exactKeep, Seq("__h"), "left")
      .withColumn("f_exact", col("f_lang") && col("__keep") === id)
      .drop("__h", "__keep")

    // stage 5: near-dup dedup among exact survivors — LSH candidates,
    // exact Jaccard verify, connected components, drop non-minima
    val surv4 = flagged1.filter(col("f_exact")).select(id, col(textCol))
    val pairs = Dedup.minhashCandidatePairs(surv4, textCol, idCol)
    val sh = surv4.select(id.as("__sid"), shingles3(tokens(col(textCol))).as("__sh"))
    val verified = pairs
      .join(sh.select(col("__sid").as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col("__sid").as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
      .withColumn("__i", size(array_intersect(col("__sha"), col("__shb"))).cast("double"))
      .filter(col("__i") / (size(col("__sha")) + size(col("__shb")) - col("__i")) >= cfg.nearDupTau)
      .select(col("id_a"), col("id_b"))
    val dropNear = Dedup.connectedComponents(verified)
      .filter(col("id") =!= col("cluster")).select(col("id").as("__drop"))
    val flagged2 = flagged1.join(dropNear, id === col("__drop"), "left")
      .withColumn("f_neardup", col("f_exact") && col("__drop").isNull)
      .drop("__drop")

    // stage 6: decontamination — drop corpus docs sharing a word-k-gram
    // with the eval set (ngramContamination flags its `eval` argument,
    // and overlap is symmetric, so the corpus goes in as `eval`)
    val flagged3 = cfg.evalSet match {
      case Some(ev) =>
        val contaminated = Dedup.ngramContamination(
            ev, flagged2.filter(col("f_neardup")).select(id, col(textCol)),
            textCol, idCol, cfg.ngramK)
          .filter(col("contaminated")).select(col("id").as("__cid"))
        flagged2.join(contaminated, id === col("__cid"), "left")
          .withColumn("f_clean", col("f_neardup") && col("__cid").isNull)
          .drop("__cid")
      case None => flagged2.withColumn("f_clean", col("f_neardup"))
    }

    // stage 7: per-source cap — m15's shape (per-source counts → integer
    // hash thresholds broadcast back → map-side filter; no windows)
    val flagged4 = cfg.samplePerSource match {
      case Some(target) =>
        val counts = flagged3.filter(col("f_clean"))
          .groupBy(col(sourceCol)).agg(count(lit(1)).as("__n_c"))
        val thr = counts.select(col(sourceCol),
          expr(s"(1048576L * least(${target}L, __n_c)) div __n_c").as("__thr"))
        flagged3.join(broadcast(thr), Seq(sourceCol), "left")
          .withColumn("f_sampled", col("f_clean") &&
            pmod(xxhash64(id), lit(1048576L)) < coalesce(col("__thr"), lit(0L)))
          .drop("__thr")
      case None => flagged3.withColumn("f_sampled", col("f_clean"))
    }

    val stageCols = Seq("input" -> lit(true),
      "min_tokens" -> col("f_tokens"), "quality" -> col("f_quality"),
      "language" -> col("f_lang"), "exact_dedup" -> col("f_exact"),
      "near_dedup" -> col("f_neardup"), "decontaminated" -> col("f_clean"),
      "sampled" -> col("f_sampled"))
    val aggs = stageCols.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }
    val one = flagged4.agg(aggs.head, aggs.tail: _*)
    val report = one.select(explode(array(stageCols.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(i).as("stage_idx"), lit(n).as("stage"), col(n).as("surviving")) }: _*)).as("p"))
      .select("p.*")
    val kept = flagged4.filter(col("f_sampled")).select(docs.columns.toSeq.map(col): _*)
    Result(kept, flagged4, report)
  }
}
