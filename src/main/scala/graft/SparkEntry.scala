package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every operator family contributes a `queries` map (name → builder)
  * and an `oracles` map (name → DuckDB-equivalent ANSI SQL). Keys
  * without an oracle get the driver's weaker rows-only check (marked
  * rows-only in SURVEY.md §2; the set is enforced by ContractSpec).
  *
  * Family → implementation map:
  *  - q1–q46   operators/Relational.scala  (analytics core, custom as-of, cube, quantiles, salted join, range window, scalar subqueries, audience, anti-join, share-of-max, sole-failing-supplier, order histogram, min-cost supplier, funnel, global-fraction HAVING, dominant shippers, cohort retention, basket pairs, decorrelated HAVING semi-join, bucketed interval-overlap join, returned customers, late priority, supplier variety, profit rollup, market share, KMV distinct + overlap, Count-Min heavy hitters)
  *  - c1–c20   operators/Cleaning.scala    (impute/encode/clip/profile/type-infer/null-standardize/expectations/FK audit/gap-fill/MAD outliers/Benford + amount audits/entropy profile/FD audit)
  *  - m1–m30   operators/MLPrep.scala      (scale/split/balance/corr/metrics/SMOTE/stratified sample/domain mix ×2 (uniform + weighted)/quantile bin/target encode/feature hash/PSI drift/Welch t-test/AUC/calibration/chi-squared/mutual info/KS/learning curve/bootstrap CI/Mann-Whitney U)
  *  - t1–t25   operators/TextOps.scala     (tokens/quality/lang-id/fingerprint/redact/normalize/n-grams/unigram LM/repetition/corpus report/langid confusion/seq packing/token budget/ppl buckets/Gopher gate/TF-IDF; t17-t19 gate the threshold/sharded scale paths directly, t20 trained-classifier audit, t21 shuffle+shards, t22 BPE drift, t23 Zipf fit, t24 full PII scrub with Luhn-gated cards, t25 code-vs-prose routing)
  *  - d1–d19   operators/Dedup.scala       (exact/jaccard/minhash/simhash/embedding/decontaminate/clusters/span dedup/sketch audit/novelty/semantic dedup/span scrub/incremental near-dup/cross-source matrix/learned-codebook semantic dedup/leakage split/sized-k ANN dedup/ANN-assignment recall audit/bloom-prefilter FP audit)
  *  - s1–s19   operators/Similarity.scala  (top-k, LSH, IVF, kNN, stats, MIPS, range search, filtered top-k, SQ8 rerank, recall audit, PQ-ADC, sized kNN join + dials form, IVF recall, norm-augmented MIPS ANN, PQ recall audit, MMR rerank, learned spherical-k-means PQ, BM25+cosine RRF hybrid retrieval)
  *  - mm1–mm11 operators/Multimodal.scala  (binary payloads, header decode, frames, modality stats, payload dedup, shard plan, decode budget, pHash near-dup, WAV/MP4 header walks, fixed-grid + content-defined chunk dedup)
  *  - st1–st24 streaming/Streams.scala     (windows, dedup, sessions ×3, interval join ×2, streaming as-of, top-k, enrichment, rate limit, MERGE sink, PSI drift monitor, rollup sink, quota admission, incremental-dedup admission, incremental distinct, late-drop accounting, histogram-quantile sink, streaming KMV distinct, composed streaming curate, durable-store time travel + version diff + mid-stream schema evolution)
  *  - i1–i15   operators/Upsert.scala      (MERGE upsert, SCD2 history build + incremental apply, CDC snapshot diff + tombstone apply, incremental/retraction-aware rollup maintenance, incremental distinct, bucketed-layout join gate, compaction planning + execution, z-order layout planning + physical apply, schema-evolved MERGE, versioned-store vacuum execution)
  *  - q47      operators/Skew.scala        (Count-Min hot-key audit deciding q19's salt factor)
  *  - e2e_curate / e2e_curate_full / e2e_curate_fixed Corpus.scala (the composed curation pipeline — 10 gated stages / all 13 with the trained+learned stages / all 13 with portable stand-ins in the engine-specific slots so the full composition is oracle-gated; per-stage attrition ledger)
  *  - e2e_clean  Pipeline.scala            (the reference's clean_data chain, whole-frame hash gate)
  * Generic pipeline (the reference's run_pipeline): Pipeline.scala.
  * Custom Catalyst pieces: plans/ (graft_cosine, AsOfJoinExec).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Cleaning.queries ++ MLPrep.queries ++
      TextOps.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ graft.streaming.Streams.queries ++ Upsert.queries ++
      Corpus.queries ++ Pipeline.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Cleaning.oracles ++ MLPrep.oracles ++
      TextOps.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ graft.streaming.Streams.oracles ++ Upsert.oracles ++
      Corpus.oracles ++ Pipeline.oracles
}
