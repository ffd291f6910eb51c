package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY.md §5). AQE's skew-join split
  * covers sort-merge joins at runtime; these cover the cases AQE
  * can't: skewed AGGREGATION keys and broadcast-infeasible skewed
  * joins. Pattern: scatter hot keys across `nSalts` sub-keys, do the
  * heavy work per sub-key, then merge — two small shuffles instead of
  * one shuffle with a straggler partition.
  */
object Skew {

  /** Two-phase (salted) aggregation: counts and sums grouped by `key`,
    * computed as groupBy(key, salt) → groupBy(key). The salt is
    * derived from a unique column so it's deterministic and spreads
    * each hot key over `nSalts` reducers. */
  def saltedAgg(df: DataFrame, key: String, uniqueCol: String, nSalts: Int,
      sumCols: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(nSalts.toLong)))
    val stage1 = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    stage1.groupBy(col(key))
      .agg(sum(col("__cnt")).as("n"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Salted join of a skewed `big` side against a non-broadcastable
    * `small` side: big rows scatter over (key, salt); small rows
    * replicate to every salt. Output equals big ⋈ small on `key`.
    * Factor 1 short-circuits to the plain join — the audit's "no skew"
    * verdict must cost nothing, and the degenerate salt column was not
    * free: a constant pmod(xxhash64(monotonically_increasing_id()))
    * per FACT row plus a second join key (r16 ×100 A/B: 14.9 → 14.0 s
    * on 60M uniform rows — the rest is the Θ(N) scan+decimal work
    * itself). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    if (nSalts <= 1) return big.join(small, Seq(key))
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  // -------------------------------------------------------------------
  // Hot-key DETECTION (round-12 VERDICT directive 6): q19's salting
  // was applied, never *decided* — no registered key measured join-key
  // skew or recommended the salt factor. This audit does, via the
  // Count-Min engine primitive (plans/SketchAggs.CmSketchAgg, q46's
  // sketch): ONE pass over the fact fills the d×w counter matrix
  // (24 KB, partial-agg merged — never a per-key shuffle of the fact),
  // then the DIM side's candidate keys probe the broadcast sketch for
  // frequency estimates. The hottest estimate vs the per-key mean
  // yields the skew ratio, and the salt factor is the smallest power
  // of two that caps the hottest key's per-subtask share at ~2× the
  // mean (clamped to [1, 256]) — all integer arithmetic, so the whole
  // decision replays in DuckDB and q47 hash-gates it.
  //
  // Scale shape: the fact is touched once (map-side sketch buffers);
  // candidates are dim-bounded rows probing a broadcast 1-row sketch;
  // every aggregate after that is over ≤ |dim| rows. CM's one-sided
  // error only ever INFLATES the estimate, so the recommendation errs
  // toward more salts — safe, never under-provisioned.

  /** The one-row persistable (cm, n_rows) Count-Min summary of
    * `fact.key` — the input everything below probes, and the artifact
    * [[graft.Artifacts.saveCmSketch]] persists so repeated joins
    * against the same fact pay the audit's fact scan ONCE at ingest
    * (the d13 band-index lifecycle applied to skew; r13 VERDICT #5). */
  def cmSummary(fact: DataFrame, key: String): DataFrame = {
    import graft.plans.SketchAggs
    fact.agg(
      SketchAggs.cmSketch(col(key), lit(1L), Relational.CmD, Relational.CmW.toInt).as("cm"),
      count(lit(1)).as("n_rows"))
  }

  /** Skew report computed from a pre-built [[cmSummary]] (fresh or
    * reloaded from an artifact): (n_rows, n_keys, hot_key, est_max,
    * mean_per_key, skew_ppm, rec_salts). No fact scan happens here —
    * the plan is dim-bounded probes of a broadcast 1-row sketch.
    * Empty `candidates` → empty frame (callers degrade to 1 salt). */
  def skewAuditFromSketch(summary: DataFrame, key: String,
      candidates: DataFrame): DataFrame = {
    import graft.plans.SketchAggs
    val d = Relational.CmD
    val w = Relational.CmW.toInt
    val cellAt = SketchAggs.cmPositions(col(key), d, w)
      .map(p => element_at(col("cm"), (p + 1).cast("int")))
    val est = candidates.select(col(key)).distinct()
      .crossJoin(broadcast(summary)) // 1-row broadcast side
      .withColumn("est", least(cellAt: _*))
    val nk = est.agg(count(lit(1)).as("n_keys"))
    // deterministic hottest pick: highest estimate, smallest key —
    // a tiny sort over dim-bounded rows
    est.orderBy(col("est").desc, col(key)).limit(1)
      .select(col("n_rows"), col(key).as("hot_key"), col("est").as("est_max"))
      .crossJoin(broadcast(nk))
      .withColumn("mean_per_key", expr("n_rows div greatest(n_keys, 1L)"))
      .withColumn("skew_ppm",
        expr("est_max * 1000000L div greatest(mean_per_key, 1L)"))
      .withColumn("__r", expr(
        "(est_max + 2 * greatest(mean_per_key, 1L) - 1) div (2 * greatest(mean_per_key, 1L))"))
      .withColumn("rec_salts", expr(
        "CASE WHEN __r <= 1 THEN 1L WHEN __r <= 2 THEN 2L WHEN __r <= 4 THEN 4L " +
          "WHEN __r <= 8 THEN 8L WHEN __r <= 16 THEN 16L WHEN __r <= 32 THEN 32L " +
          "WHEN __r <= 64 THEN 64L WHEN __r <= 128 THEN 128L ELSE 256L END"))
      .select(col("n_rows"), col("n_keys"), col("hot_key"), col("est_max"),
        col("mean_per_key"), col("skew_ppm"), col("rec_salts"))
  }

  /** One-row skew report for `fact.key`, candidates from the dim side:
    * (n_rows, n_keys, hot_key, est_max, exact_max, mean_per_key,
    * skew_ppm, rec_salts). exact_max is the audit column (d9's
    * measure-don't-guess role): the true hottest count, beside the
    * sketch estimate the decision actually uses — it needs the fact
    * itself, which is why the sketch-only form above omits it. */
  def skewAudit(fact: DataFrame, key: String, candidates: DataFrame): DataFrame = {
    val exactMax = fact.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")).as("exact_max"))
    skewAuditFromSketch(cmSummary(fact, key), key, candidates)
      .crossJoin(broadcast(exactMax))
      .select(col("n_rows"), col("n_keys"), col("hot_key"), col("est_max"),
        col("exact_max"), col("mean_per_key"), col("skew_ppm"), col("rec_salts"))
  }

  /** rec_salts from a pre-built/reloaded [[cmSummary]] — total: an
    * empty dim side yields an empty audit, which degrades to 1 salt
    * (the join of anything with an empty dim is empty anyway). */
  def recommendSaltsFromSketch(summary: DataFrame, key: String,
      candidates: DataFrame): Int =
    skewAuditFromSketch(summary, key, candidates).select(col("rec_salts"))
      .collect().headOption.map(_.getLong(0).toInt).getOrElse(1)

  /** The salt factor [[saltedJoin]] should use for fact⋈dim on `key` —
    * rec_salts, collected (one small job; the audit plan is a single
    * fact pass plus dim-bounded probes). */
  def recommendSalts(fact: DataFrame, key: String, candidates: DataFrame): Int =
    recommendSaltsFromSketch(cmSummary(fact, key), key, candidates)

  /** [[saltedJoin]] with the factor DECIDED by the Count-Min audit
    * instead of guessed — q19's registered path. Pays one fact scan
    * for the sketch; amortize with the overload below. */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, key: String): DataFrame =
    saltedJoin(big, small, key, math.max(1, recommendSalts(big, key, small)))

  /** [[saltedJoinAuto]] against a PERSISTED sketch: repeated joins on
    * the same fact reuse the ingest-time [[cmSummary]] artifact
    * ([[graft.Artifacts.loadCmSketch]]) instead of re-scanning the
    * fact per join — the audit cost is paid once per ingest, not once
    * per query. */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, key: String,
      summary: DataFrame): DataFrame =
    saltedJoin(big, small, key,
      math.max(1, recommendSaltsFromSketch(summary, key, small)))
}
