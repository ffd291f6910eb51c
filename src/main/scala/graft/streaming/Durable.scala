package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, replay-safe state for foreachBatch sinks (round-12 VERDICT
  * directive 3: the in-memory sinks were slicing-invariant by spec but
  * had never been checkpointed, killed, and resumed).
  *
  * EXACTLY-ONCE CONTRACT (what each durable sink assumes and provides):
  *  1. The query runs with a `checkpointLocation` over a REPLAYABLE
  *     source (file, Kafka, ...). After a crash/restart, Structured
  *     Streaming re-delivers the last possibly-unprocessed batch with
  *     the SAME batchId — foreachBatch is at-least-once.
  *  2. State commits here are ATOMIC: all frames are written under a
  *     fresh `commit=<batchId>` directory FIRST, and the manifest
  *     (single file, temp-write + rename) flips last. A crash mid-
  *     commit leaves the previous manifest — and therefore the
  *     previous state — intact and the half-written directory
  *     unreferenced (GC'd by the next successful commit).
  *  3. A re-delivered batchId ≤ lastCommitted short-circuits to a
  *     no-op, so each batch's effect lands in the state EXACTLY once.
  *  4. None of these sinks write side outputs beyond the state store;
  *     anything a caller adds outside it needs its own idempotence.
  *
  * State is one-or-more named DataFrames per commit (DedupAdmission
  * carries three). Reads always come from the last COMMITTED directory
  * and writes go to a new one, so fold lineage never reads the files
  * it is writing. The manifest also carries the fold ORDINAL (count of
  * applied batches) for sinks whose output records arrival order
  * (DistinctCountSink's first_batch).
  */
class DurableState(spark: SparkSession, dir: String) {
  private val root = new Path(dir)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val manifest = new Path(root, "_latest")

  /** (lastCommitted batchId, fold ordinal of the NEXT apply). */
  def committed: Option[(Long, Long)] = {
    if (!fs.exists(manifest)) None
    else {
      val in = fs.open(manifest)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      val parts = txt.split(" ")
      Some((parts(0).toLong, parts(1).toLong))
    }
  }

  def alreadyApplied(batchId: Long): Boolean =
    committed.exists(_._1 >= batchId)

  /** Fold ordinal the next apply should stamp (0 for a fresh store). */
  def nextFoldIndex: Long = committed.map(_._2).getOrElse(0L)

  /** Frames of the last committed state; empty map for a fresh store. */
  def loadAll(): Map[String, DataFrame] = committed match {
    case None => Map.empty
    case Some((id, _)) =>
      val base = new Path(root, s"commit=$id")
      fs.listStatus(base).toSeq.map(_.getPath)
        .map(p => p.getName -> spark.read.parquet(p.toString)).toMap
  }

  /** Write `frames` under commit=<batchId>, then atomically flip the
    * manifest and GC older commit directories. */
  def commit(batchId: Long, frames: Map[String, DataFrame]): Unit = {
    val base = new Path(root, s"commit=$batchId")
    if (fs.exists(base)) fs.delete(base, true) // leftover from a crash
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(new Path(base, name).toString)
    }
    val tmp = new Path(root, s"_latest.tmp.$batchId")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId ${nextFoldIndex + 1}".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(manifest)) fs.delete(manifest, false)
    if (!fs.rename(tmp, manifest))
      throw new IllegalStateException(s"could not commit manifest for batch $batchId")
    // GC: every commit dir except the one just flipped to
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("commit=") && p.getName != s"commit=$batchId")
      .foreach(p => fs.delete(p, true))
  }
}

/** The six inventory sinks, durable. Each reuses the EXACT fold logic
  * of its in-memory twin (same library calls), swapping
  * localCheckpoint-held frames for [[DurableState]] commits — so the
  * slicing-invariance and fold==rebuild properties the batch twins
  * gate carry over, and kill-and-resume is StreamingRecoverySpec's
  * job. */
object DurableSinks {

  /** st12's UpsertSink. */
  class DurableUpsertSink(spark: SparkSession, dir: String,
      keys: Seq[String], ordering: Seq[org.apache.spark.sql.Column]) {
    private val store = new DurableState(spark, dir)
    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (store.alreadyApplied(batchId)) return
      val next = store.loadAll().get("snap") match {
        case None => graft.operators.Upsert.latestSnapshot(batch, keys, ordering)
        case Some(prev) => graft.operators.Upsert.mergeLatest(prev, batch, keys, ordering)
      }
      store.commit(batchId, Map("snap" -> next))
    }
    def snapshot: Option[DataFrame] = store.loadAll().get("snap")
  }

  /** st14's RollupSink. */
  class DurableRollupSink(spark: SparkSession, dir: String,
      keys: Seq[String], valueCol: String, tsCol: String) {
    import graft.operators.Upsert
    private val store = new DurableState(spark, dir)
    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (store.alreadyApplied(batchId)) return
      val partial = Upsert.rollupState(batch, keys, valueCol, tsCol)
      val next = store.loadAll().get("state") match {
        case None => partial
        case Some(prev) => Upsert.rollupMerge(prev, partial, keys)
      }
      store.commit(batchId, Map("state" -> next))
    }
    def snapshot: Option[DataFrame] =
      store.loadAll().get("state").map(Upsert.rollupFinish)
  }

  /** st16's DedupAdmissionSink (three state frames). `bootstrap` =
    * (band-index path, shingle-store path) from [[graft.Artifacts]]:
    * preloads the state when — and only when — the durable store is
    * FRESH (a resumed store already contains the folded history,
    * which supersedes the bootstrap snapshot). */
  class DurableDedupAdmissionSink(spark: SparkSession, dir: String,
      tau: Double = graft.operators.Dedup.IncTau,
      bootstrap: Option[(String, String)] = None) {
    import graft.functions.TextFunctions.{shingles3, tokens}
    private val store = new DurableState(spark, dir)
    private def bootstrapped(st: Map[String, DataFrame]): Map[String, DataFrame] =
      if (st.nonEmpty) st
      else bootstrap.map { case (indexPath, shinglesPath) => Map(
        "index" -> graft.Artifacts.loadBandIndex(spark, indexPath),
        "shstore" -> graft.Artifacts.loadShingleStore(spark, shinglesPath)
          .select(col("doc_id").as("id"), col("sh")))
      }.getOrElse(st)
    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (store.alreadyApplied(batchId)) return
      val st = bootstrapped(store.loadAll())
      val keysB = graft.operators.Dedup.bandKeys(batch, "text", "doc_id")
      val shB = batch.select(col("doc_id").as("id"), shingles3(tokens(col("text"))).as("sh"))
      val probe = st.get("index").map(_.unionByName(keysB)).getOrElse(keysB)
      val allSh = st.get("shstore").map(_.unionByName(shB)).getOrElse(shB)
      val cands = keysB.select(col("band"), col("key"), col("id").as("id_new"))
        .join(probe.select(col("band"), col("key"), col("id").as("id_old")), Seq("band", "key"))
        .filter(col("id_old") < col("id_new"))
        .select(col("id_new"), col("id_old")).distinct()
      val dup = graft.operators.Dedup.pairJaccard(cands,
          allSh.withColumnRenamed("id", "doc_id"))
        .filter(col("jac") >= tau)
        .select(col("id_new").as("doc_id")).distinct()
      val decisions = batch.select(col("doc_id"))
        .join(dup.withColumn("__d", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"), col("__d").isNull.as("admitted"))
      val acc = st.get("acc").map(_.unionByName(decisions)).getOrElse(decisions)
      store.commit(batchId, Map("index" -> probe, "shstore" -> allSh, "acc" -> acc))
    }
    def decisions: Option[DataFrame] = store.loadAll().get("acc")
  }

  /** st17's DistinctCountSink (key set + counters; first_batch comes
    * from the store's fold ordinal, so it survives restarts). */
  class DurableDistinctCountSink(spark: SparkSession, dir: String) {
    private val store = new DurableState(spark, dir)
    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (store.alreadyApplied(batchId)) return
      val st = store.loadAll()
      val b = batch.select(col("day"), col("user_id")).distinct()
      val fresh = st.get("keys")
        .map(k => b.join(k, Seq("day", "user_id"), "left_anti")).getOrElse(b)
      val add = fresh.groupBy(col("day")).agg(count(lit(1)).as("__n_new"))
      val i = store.nextFoldIndex
      val next = st.get("acc") match {
        case None => add.select(col("day"), col("__n_new").as("n_users"),
          lit(i).as("first_batch"))
        case Some(c) => c.join(add, Seq("day"), "full")
          .select(col("day"),
            (coalesce(col("n_users"), lit(0L)) + coalesce(col("__n_new"), lit(0L)))
              .as("n_users"),
            coalesce(col("first_batch"), lit(i)).as("first_batch"))
      }
      val keys = st.get("keys").map(_.unionByName(fresh)).getOrElse(fresh)
      store.commit(batchId, Map("keys" -> keys, "acc" -> next))
    }
    def result: Option[DataFrame] = store.loadAll().get("acc")
  }

  /** st19's HistogramSink. */
  class DurableHistogramSink(spark: SparkSession, dir: String) {
    private val store = new DurableState(spark, dir)
    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (store.alreadyApplied(batchId)) return
      val partial = Streams.histogramState(batch)
      val next = store.loadAll().get("state") match {
        case None => partial
        case Some(prev) => Streams.histogramMerge(prev, partial)
      }
      store.commit(batchId, Map("state" -> next))
    }
    def snapshot: Option[DataFrame] =
      store.loadAll().get("state").map(Streams.quantileFinish)
  }

  /** st20's KmvSink. */
  class DurableKmvSink(spark: SparkSession, dir: String) {
    private val store = new DurableState(spark, dir)
    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (store.alreadyApplied(batchId)) return
      val partial = Streams.kmvState(batch)
      val next = store.loadAll().get("sk") match {
        case None => partial
        case Some(prev) => Streams.kmvMerge(prev, partial)
      }
      store.commit(batchId, Map("sk" -> next))
    }
    def snapshot: Option[DataFrame] =
      store.loadAll().get("sk").map(Streams.kmvFinish)
  }
}
