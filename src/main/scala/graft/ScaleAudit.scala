package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.VectorFunctions.normSq
import graft.operators.{Dedup, Similarity}

/** Unified scale-dial observability (round-11 VERDICT item 8): the
  * engine's corpus-adaptive dials — [[Similarity.sizedPlanes]],
  * [[Dedup.sizedCells]], the MaxBucket hot-bucket cap, annAssign's
  * Hamming probe radius — are each documented at their operator;
  * this report answers, for a CONCRETE corpus, "what will the engine
  * actually choose, and where is the cap biting?" in one frame an
  * operator dashboard can ingest per batch. Cap-loss rows generalize
  * [[Similarity.knnJoinCapAudit]]'s shape: a cell over the cap emits
  * no candidates (bounded cost, conservative keep), so a nonzero
  * overcap trend is THE signal a sizing dial is undersized for the
  * corpus — alert on it before recall quietly erodes.
  *
  * Long format, all-integer values: (component, dial, value). One
  * row per dial or cap-loss signal. The handful of corpus counts the
  * dials derive from are the SAME O(1)-output scans the operators
  * themselves run at plan time (s12/d17's documented class); the
  * cap-loss aggregates are one groupBy per sketch family, never
  * pairs.
  */
object ScaleAudit {

  /** Audit the standard tables under `dir` (documents + embeddings —
    * the corpora the sketch families run on). */
  def report(s: SparkSession, dir: String,
      targetBucket: Int = 16, targetCell: Int = 25,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir).filter(normSq(col("embedding")) > 0)
      .select(col("vec_id").as("id"), col("embedding"))

    val nDocs = docs.count()
    val nVecs = emb.count()

    // --- kNN join / ANN family (s12/s14/s2): sized planes over the
    // embedding corpus; cap-loss = occupied LSH cells over MaxBucket
    val planes = Similarity.sizedPlanes(nVecs, targetBucket)
    val lshCells = emb
      .select(Similarity.lshBucket(col("embedding"), planes).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("cells"),
        sum(when(col("n") > maxBucket, 1L).otherwise(0L)).as("overcap_cells"),
        sum(when(col("n") > maxBucket, col("n")).otherwise(0L)).as("overcap_rows"))
      .head()

    // --- semantic dedup at scale (d17): sized cells + centroid-LSH
    // planes + the radius-2 probe set size
    val k = Dedup.sizedCells(nVecs, targetCell)
    val kPlanes = Similarity.sizedPlanes(k.toLong, 8)
    val probeBuckets = 1L + kPlanes + kPlanes.toLong * (kPlanes - 1) / 2

    // --- MinHash banding (d3/d7/d13/d14): cap-loss over band buckets
    val bandCells = Dedup.bandKeys(docs, "text", "doc_id")
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("cells"),
        sum(when(col("n") > maxBucket, 1L).otherwise(0L)).as("overcap_cells"),
        sum(when(col("n") > maxBucket, col("n")).otherwise(0L)).as("overcap_rows"))
      .head()

    // --- SimHash pigeonhole buckets (d4): cap-loss over sim16 values
    val simCells = docs
      .select(TextFunctions.simhash16(TextFunctions.tokenCodes(col("text"))).as("sim"))
      .groupBy(col("sim")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("cells"),
        sum(when(col("n") > maxBucket, 1L).otherwise(0L)).as("overcap_cells"),
        sum(when(col("n") > maxBucket, col("n")).otherwise(0L)).as("overcap_rows"))
      .head()

    import s.implicits._
    Seq[(String, String, Long)](
      ("corpus", "n_docs", nDocs),
      ("corpus", "n_vectors", nVecs),
      ("knn_join", "planes", planes.toLong),
      ("knn_join", "target_bucket", targetBucket.toLong),
      ("knn_join", "max_bucket", maxBucket.toLong),
      ("knn_join", "occupied_cells", lshCells.getLong(0)),
      ("knn_join", "overcap_cells", lshCells.getLong(1)),
      ("knn_join", "overcap_rows", lshCells.getLong(2)),
      ("semantic_dedup", "cells_k", k.toLong),
      ("semantic_dedup", "target_cell", targetCell.toLong),
      ("semantic_dedup", "centroid_planes", kPlanes.toLong),
      ("semantic_dedup", "probe_radius", 2L),
      ("semantic_dedup", "probe_buckets", probeBuckets),
      ("minhash_bands", "bands", TextFunctions.Bands.toLong),
      ("minhash_bands", "occupied_buckets", bandCells.getLong(0)),
      ("minhash_bands", "overcap_buckets", bandCells.getLong(1)),
      ("minhash_bands", "overcap_rows", bandCells.getLong(2)),
      ("simhash", "bits", TextFunctions.SimBits.toLong),
      ("simhash", "occupied_buckets", simCells.getLong(0)),
      ("simhash", "overcap_buckets", simCells.getLong(1)),
      ("simhash", "overcap_rows", simCells.getLong(2)),
      ("shards", "shard_size", graft.operators.TextOps.ShardSize),
      ("shards", "n_shards", (nDocs + graft.operators.TextOps.ShardSize - 1) /
        graft.operators.TextOps.ShardSize),
    ).toDF("component", "dial", "value")
  }
}
