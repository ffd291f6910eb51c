package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Skew}

/** Skew-stress gate: the skew-safe paths (q19's salted join, d3's
  * capped LSH buckets) are driven by GENERATED pathological
  * distributions at bench-scale volume, and the task-level effect is
  * asserted from the Spark listener — per-task shuffle-read records
  * must stay bounded. Results matching the plain path proves
  * correctness; THIS suite proves the salting/caps actually bound
  * what any one task processes, which is the 100 TB claim.
  */
class SkewStressSpec extends SparkSuite {

  /** Run `body`, return per-stage task shuffle-read record counts.
    * The listener bus is async: poll until the counts stop changing. */
  private def taskShuffleReads(body: => Unit): Map[Int, Vector[Long]] = {
    val acc = scala.collection.mutable.Map.empty[Int, Vector[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) acc.synchronized {
          acc(te.stageId) = acc.getOrElse(te.stageId, Vector.empty) :+
            m.shuffleReadMetrics.recordsRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val n = acc.synchronized(acc.values.map(_.size).sum)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.synchronized(acc.toMap)
  }

  /** max/median per-task shuffle-read records of the heaviest stage —
    * the straggler signature (1.0 = perfectly even). */
  private def heaviestStageSpread(stages: Map[Int, Vector[Long]]): Double = {
    val tasks = stages.maxBy(_._2.sum)._2.sorted
    val median = tasks(tasks.size / 2).toDouble
    tasks.last / math.max(median, 1.0)
  }

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // 2M-row fact with ONE key owning 10% of all rows (the zipf head),
  // the rest uniform over 20k keys — bench-scale volume (more rows
  // than sf0.1's lineitem) with a hotter head than real data.
  private def skewedFact: DataFrame =
    spark.range(2000000L).select(
      when(col("id") % 10 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(20000L))).as("k"),
      col("id").as("payload"))

  private def dim: DataFrame =
    spark.range(20000L).select(col("id").as("k"), (col("id") * 7L).as("dim_v"))

  test("salted join bounds per-task shuffle input on a 10%-hot key; the plain join does not") {
    // AQE off: isolate the salting itself (AQE's skew-split is the
    // OTHER mitigation; q19 exists for the joins AQE can't rescue).
    // Broadcast off: a 20k-row dim would otherwise broadcast and
    // dodge the shuffle entirely — the stress targets shuffle joins.
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32") {
      val plain = taskShuffleReads {
        skewedFact.join(dim, "k").select(count(lit(1))).collect()
      }
      val salted = taskShuffleReads {
        Skew.saltedJoin(skewedFact, dim, "k", 64).select(count(lit(1))).collect()
      }
      val plainSpread = heaviestStageSpread(plain)
      val saltedSpread = heaviestStageSpread(salted)
      // the hot key parks ~10% of the fact on ONE reducer: with 32
      // partitions that task reads ~4x the median. Salting needs
      // nSalts comfortably ABOVE the partition count for a 10% head:
      // each hot sub-key is an indivisible ~200k/nSalts-row chunk, so
      // with only 16 salts a partition drawing two chunks still reads
      // ~1.7x the median (measured); 64 salts shrinks chunk lumpiness
      // to noise. That sizing rule is the point of this gate.
      assert(plainSpread > 2.5,
        s"stress fixture not skewed enough to prove anything: plain spread $plainSpread")
      assert(saltedSpread < 1.7,
        s"salted join still has a straggler task: spread $saltedSpread (plain was $plainSpread)")
      // and salting must not change the result (q19's transparency
      // contract, re-checked on the pathological distribution)
      val a = Skew.saltedJoin(skewedFact, dim, "k", 64).agg(
        count(lit(1)), sum(col("payload")), sum(col("dim_v"))).collect()(0).toSeq
      val b = skewedFact.join(dim, "k").agg(
        count(lit(1)), sum(col("payload")), sum(col("dim_v"))).collect()(0).toSeq
      assert(a === b)
    }
  }

  test("LSH hot-bucket cap keeps candidate generation sub-quadratic on degenerate boilerplate") {
    import spark.implicits._
    // 1500 byte-identical docs (the boilerplate pathology: one band
    // bucket of 1500) + 300 distinct docs with a known near-dup pair
    val boiler = (1 to 1500).map(i =>
      (i.toLong, "terms of service apply to all users of this website effective immediately"))
    val distinct = (1 to 300).map(i =>
      (10000L + i, s"document number $i talks about topic ${i * 37} in some detail and depth"))
    val docs = (boiler ++ distinct).toDF("doc_id", "text")
    // uncapped: the degenerate bucket alone emits C(1500,2) pairs —
    // the quadratic blowup one task would have to produce
    val uncapped = Dedup.minhashCandidatePairs(docs, "text", "doc_id", maxBucket = 100000)
      .filter(col("id_a") <= 1500 && col("id_b") <= 1500).count()
    assert(uncapped === 1500L * 1499 / 2,
      s"fixture must be degenerate enough to go quadratic uncapped: $uncapped")
    // capped (library default): the hot bucket is dropped entirely,
    // and no task's shuffle input explodes
    val stages = taskShuffleReads {
      val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      assert(pairs.filter(col("id_a") <= 1500 && col("id_b") <= 1500).count() === 0L,
        "capped run must drop the degenerate bucket (dedupExact handles exact copies)")
    }
    val allTasks = stages.values.flatten
    // absolute bound: ~1800 docs × Bands band-keys plus window counts;
    // a leaked quadratic bucket would put >1M records on one task
    assert(allTasks.max < 200000L,
      s"a task read ${allTasks.max} shuffle records — hot-bucket cap not bounding work")
  }

  test("AQE skew-join split actually fires on the planted hot-key join, result unchanged") {
    // The OTHER skew mitigation (vs q19's salting): AQE splits an
    // oversized sort-merge partition at runtime. Thresholds scale
    // down to spec volume — production tunes the same knobs at 256MB
    // grain; what this gate proves is that the planted distribution
    // TRIPS the split (skew=true in the final adaptive plan) and that
    // the split is transparent to results.
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join
      "spark.sql.shuffle.partitions" -> "32") {
      val j = skewedFact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("sp"), sum(col("dim_v")).as("sd"))
      val got = j.collect()(0).toSeq
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the planted skewed partition — final plan:\n$finalPlan")
      // transparency: equals the AQE-off plain join
      val want = withConfsResult()
      assert(got === want, "the skew split must not change the aggregate")
    }
  }

  /** The AQE-off reference result for the skew-split transparency check. */
  private def withConfsResult(): Seq[Any] = {
    var out: Seq[Any] = null
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      out = skewedFact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("sp"), sum(col("dim_v")).as("sd"))
        .collect()(0).toSeq
    }
    out
  }

  test("hot-key audit DECIDES the salt: 1 on uniform keys, scaled up on the 10% head, consumed by saltedJoinAuto") {
    import spark.implicits._
    // uniform fact → no skew → the audit must not replicate the dim
    val uniform = spark.range(200000L)
      .select(pmod(xxhash64(col("id")), lit(2000L)).as("k"), col("id").as("payload"))
    val udim = spark.range(2000L).select(col("id").as("k"), (col("id") * 7L).as("dim_v"))
    // CM collisions (2000 keys over 1024 cells) can inflate the
    // hottest ESTIMATE a little — the audit may say 2, never 256
    val uniformRec = Skew.recommendSalts(uniform, "k", udim)
    assert(uniformRec <= 2,
      s"uniform keys must not pay meaningful small-side replication: $uniformRec")

    // the planted 10% head: mean = 2M/20k = 100 rows/key, hottest ≈
    // 200k (CM one-sided: estimate ≥ truth) → ratio ~2000/2 → clamp 256
    val audit = Skew.skewAudit(skewedFact, "k", dim).collect().head
    assert(audit.getAs[Long]("hot_key") === 0L, "audit must finger the planted hot key")
    assert(audit.getAs[Long]("est_max") >= audit.getAs[Long]("exact_max"),
      "Count-Min estimates are one-sided: never below the true count")
    assert(audit.getAs[Long]("rec_salts") === 256L,
      s"a 2000x head must recommend the max factor: $audit")

    // the consumed factor bounds the straggler AND stays transparent
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32") {
      val auto = taskShuffleReads {
        Skew.saltedJoinAuto(skewedFact, dim, "k").select(count(lit(1))).collect()
      }
      val spread = heaviestStageSpread(auto)
      assert(spread < 1.7,
        s"auto-salted join still has a straggler: spread $spread")
      val a = Skew.saltedJoinAuto(skewedFact, dim, "k").agg(
        count(lit(1)), sum(col("payload")), sum(col("dim_v"))).collect()(0).toSeq
      val b = skewedFact.join(dim, "k").agg(
        count(lit(1)), sum(col("payload")), sum(col("dim_v"))).collect()(0).toSeq
      assert(a === b, "auto salting must be result-transparent")
    }
  }

  test("saltedJoinAuto is total on an empty dim side: degrades to 1 salt, returns empty") {
    import spark.implicits._
    // r13 ADVICE: recommendSalts .head()'d an empty audit frame and
    // threw NoSuchElementException instead of degrading.
    val emptyDim = spark.range(0L).select(col("id").as("k"), col("id").as("dim_v"))
    assert(Skew.recommendSalts(skewedFact, "k", emptyDim) === 1)
    assert(Skew.saltedJoinAuto(skewedFact, emptyDim, "k").count() === 0L)
  }

  test("persisted CM sketch: reloaded artifact is probe-equal and feeds saltedJoinAuto without a fact scan") {
    import spark.implicits._
    // r13 VERDICT #5: the audit's fact pass should be payable ONCE at
    // ingest. Save the summary, reload it, and require the decision
    // (rec_salts) and full probe rows to match the in-memory form.
    val dir = java.nio.file.Files.createTempDirectory("graft-cm-art").toString
    val summary = Skew.cmSummary(skewedFact, "k")
    graft.Artifacts.saveCmSketch(summary, dir)
    val reloaded = graft.Artifacts.loadCmSketch(spark, dir)
    val fresh = Skew.skewAuditFromSketch(summary, "k", dim)
      .collect().map(_.toSeq).toSeq
    val fromArtifact = Skew.skewAuditFromSketch(reloaded, "k", dim)
      .collect().map(_.toSeq).toSeq
    assert(fromArtifact === fresh, "reloaded sketch must be probe-equal")
    assert(Skew.recommendSaltsFromSketch(reloaded, "k", dim) === 256)
    // the overload consumes the artifact and stays result-transparent
    val a = Skew.saltedJoinAuto(skewedFact, dim, "k", reloaded).agg(
      count(lit(1)), sum(col("payload")), sum(col("dim_v"))).collect()(0).toSeq
    val b = skewedFact.join(dim, "k").agg(
      count(lit(1)), sum(col("payload")), sum(col("dim_v"))).collect()(0).toSeq
    assert(a === b)
    // a mis-pointed path fails fast with the artifact contract error
    val bad = java.nio.file.Files.createTempDirectory("graft-cm-bad").toString
    dim.write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException](graft.Artifacts.loadCmSketch(spark, bad))
    assert(e.getMessage.contains("count-min summary"))
  }
}
