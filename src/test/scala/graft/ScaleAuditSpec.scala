package graft

import org.apache.spark.sql.functions._

class ScaleAuditSpec extends SparkSuite {

  test("ScaleAudit: dials match the sizing rules; cap-loss signals fire when the cap bites") {
    val r = ScaleAudit.report(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val nVecs = Tables.embeddings(spark, sf)
      .filter(graft.functions.VectorFunctions.normSq(col("embedding")) > 0).count()
    assert(r(("corpus", "n_vectors")) === nVecs)
    assert(r(("knn_join", "planes")) ===
      graft.operators.Similarity.sizedPlanes(nVecs, 16).toLong,
      "planes row must be what knnJoinAll would actually pick")
    val k = graft.operators.Dedup.sizedCells(nVecs, 25)
    assert(r(("semantic_dedup", "cells_k")) === k.toLong)
    val p = graft.operators.Similarity.sizedPlanes(k.toLong, 8)
    assert(r(("semantic_dedup", "probe_buckets")) === 1L + p + p.toLong * (p - 1) / 2)
    // the test corpus fits its caps: no silent loss at this SF
    assert(r(("knn_join", "overcap_rows")) === 0L)
    assert(r(("minhash_bands", "overcap_rows")) === 0L)
    // consistency: overcap rows only exist with overcap cells, and an
    // overcap cell holds more than the cap by definition
    Seq("knn_join", "minhash_bands", "simhash").foreach { c =>
      val cells = r((c, s"overcap_${if (c == "knn_join") "cells" else "buckets"}"))
      val rows = r((c, "overcap_rows"))
      assert((cells == 0L) == (rows == 0L), s"$c cap-loss rows/cells disagree")
    }
    // squeeze the cap until it must bite: with maxBucket=1 any shared
    // bucket is over-cap — the audit must SEE the loss, that is its job
    val tight = ScaleAudit.report(spark, sf, maxBucket = 1).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(tight(("minhash_bands", "overcap_rows")) > 0L,
      "planted near-dups share band buckets; a cap of 1 must show loss")
  }

  // -------------------------------------------------------------------
  // Scan-multiplicity regression guard (round 15): the keys whose
  // lineage-re-execution disease was fixed (one localCheckpoint at the
  // shared frontier) must not silently regress to scanning their fact
  // table once per consumer branch. Counts the EXECUTED parquet scans
  // of the named table in the finalized adaptive plan via
  // ScanAudit.scans; ReusedExchange descendants count as reused, not
  // executed. Bounds are the post-fix counts + 0 slack — a new branch
  // that forgets the checkpoint shows up as a +1 here.
  test("fixed keys stay single-scan: d6/d19/d17 executed-scan bounds hold") {
    def executedScans(key: String, table: String): Int = {
      val df = SparkEntry.queries(key)(spark, sf)
      df.queryExecution.toRdd.count()
      ScanAudit.scans(df.queryExecution.executedPlan)
        .count { case (t, reused) => t == table && !reused }
    }
    // d6: eval side + the checkpointed train side = 2 documents scans
    assert(executedScans("d6_decontaminate", "documents.parquet") <= 2,
      "d6 must not re-execute the tokenize+shingle scan per branch")
    // d19: ev + tr checkpoints leave 2 documents scans
    assert(executedScans("d19_bloom_audit", "documents.parquet") <= 2,
      "d19 must not re-execute the shingle scan per audit branch")
    // d17: the n-count job runs (and scans) BEFORE the final plan, so
    // it is invisible to this walk, and the lazy localCheckpoint hides
    // the collapse-groupBy's parquet read behind an RDDScanExec once
    // executed — the only FileSourceScanExec left in the finalized
    // plan is the zeros branch's. Measured count: 1. The bound still
    // catches checkpoint removal (every Lloyd branch would surface its
    // own parquet scan, blowing straight past it).
    assert(executedScans("d17_semantic_dedup_ann", "embeddings.parquet") <= 1,
      "d17 must not re-scan embeddings per Lloyd iteration")
  }
}
