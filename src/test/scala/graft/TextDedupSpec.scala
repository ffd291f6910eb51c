package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

class TextDedupSpec extends SparkSuite {

  test("t2 quality scores in [0, 1]") {
    val r = TextOps.t2(spark, sf)
    assert(r.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
    assert(r.count() > 0)
  }

  test("t4 fingerprints are valid residues and mostly distinct") {
    val r = TextOps.t4(spark, sf)
    assert(r.filter(col("fp") < 0 || col("fp") >= 1000000007L).count() === 0)
    val n = r.count()
    assert(r.select("fp").distinct().count() > n * 9 / 10)
  }

  test("t5 redaction leaves no live emails or phones") {
    val r = TextOps.t5(spark, sf)
    assert(r.filter(col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() === 0)
    assert(r.filter(col("redacted").rlike("\\d{3}-\\d{3}-\\d{4}")).count() === 0)
    assert(r.filter(col("n_emails") < 1 || col("n_phones") < 1).count() === 0) // planted PII was found
  }

  test("t6 normalization round-trips messy text to lower(text) and is idempotent") {
    val r = TextOps.t6(spark, sf)
    assert(r.filter(!col("roundtrip")).count() === 0)
    val again = r.select(col("doc_id"),
      (TextOps.normalizeText(col("norm")) === col("norm")).as("idem"))
    assert(again.filter(!col("idem")).count() === 0)
  }

  test("d2 jaccard in [0, 1]") {
    val r = Dedup.d2(spark, sf)
    assert(r.filter(col("jaccard") < 0 || col("jaccard") > 1).count() === 0)
  }

  test("d4 simhash in 16-bit range, hamming in [0, 16]") {
    val r = Dedup.d4(spark, sf)
    assert(r.filter(col("sim_a") < 0 || col("sim_a") > 65535).count() === 0)
    assert(r.filter(col("hamming") < 0 || col("hamming") > 16).count() === 0)
  }

  test("dedupExact keeps one row per distinct text, smallest id") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val deduped = Dedup.dedupExact(docs, "text", "doc_id")
    val distinctTexts = docs.select("text").distinct().count()
    assert(deduped.count() === distinctTexts)
    assert(deduped.count() < docs.count()) // sf0.1 has 8 dup texts
  }

  test("connected components match union-find on 10 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val n = 20 + rnd.nextInt(60)
      val edges = (1 to n).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // reference: classic union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(v => v -> find(v)).toMap
      // both the single-task union-find path and the distributed
      // iterative path must match the reference union-find
      val gotLocal = Dedup.connectedComponentsLocal(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotIter = Dedup.connectedComponentsIterative(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLocal === want, s"local path, trial $trial")
      assert(gotIter === want, s"iterative path, trial $trial")
    }
  }

  test("connected components collapse transitive chains to one cluster") {
    import spark.implicits._
    // chain 1-2-3, pair 10-11, singleton edges absent
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components converge on a 2000-long chain (pointer jumping)") {
    import spark.implicits._
    // worst case for plain neighbor-min propagation: one chain whose
    // diameter (2000) vastly exceeds maxIter (20). Pointer jumping
    // halves label-chain depth per round, so this converges in
    // O(log 2000) ≈ 11 rounds; without it the iterative path throws.
    // (Called directly: the dispatcher would route a 2000-edge graph
    // to the single-task union-find.)
    val chain = (0L until 1999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponentsIterative(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length === 2000)
    assert(cc.forall(_._2 == 0L), "every chain member labels to the min id 0")
  }

  test("end-to-end near-dup dedup removes exactly the duplicate copies at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val deduped = Dedup.dedupNearDuplicates(docs, "text", "doc_id", tau = 0.99)
    // 5000 docs, 4992 distinct texts → exactly the 8 extra copies go
    assert(deduped.count() === docs.select("text").distinct().count())
    // kept doc per dup group is the smallest id
    val dupMins = docs.groupBy("text").agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
      .filter(col("n") > 1).select("keep")
    assert(dupMins.join(deduped, dupMins("keep") === deduped("doc_id")).count() === dupMins.count())
  }

  test("simhash pigeonhole buckets find every pair within hamming 3 (vs brute force)") {
    val docs = Tables.documents(spark, sf).limit(200)
    val viaB = Dedup.simhashCandidatePairs(docs, "text", "doc_id", 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over the same 200 docs
    import graft.functions.TextFunctions._
    val sims = docs.select(col("doc_id").as("id"), simhash16(tokenCodes(col("text"))).as("sim"))
    val brute = sims.as("a").join(sims.as("b"), col("a.id") < col("b.id"))
      .filter(bit_count(expr("a.sim ^ b.sim")) <= 3)
      .select(col("a.id"), col("b.id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaB === brute) // pigeonhole guarantee: no recall loss at radius 3
  }

  test("embedding near-dup pairs: exact precision, bucket-restricted recall") {
    import graft.functions.VectorFunctions
    val emb = Tables.embeddings(spark, sf).limit(300)
    val tau = 0.3
    val got = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: same-bucket brute force with the same threshold
    val b = emb.select(col("vec_id").as("id"), col("embedding").as("e"),
      graft.operators.Similarity.lshBucket(col("embedding")).as("bucket"))
    val want = b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .filter(VectorFunctions.cosine(col("a.e"), col("b.e")) >= tau)
      .select(col("a.id"), col("b.id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("d6 decontamination flags some-but-not-all eval docs; self-check flags everything") {
    val r = Dedup.d6(spark, sf).collect()
    val contaminated = r.count(_.getAs[Boolean]("contaminated"))
    assert(r.length === 50) // src0+src1 eval slice at sf0.01
    assert(contaminated > 0 && contaminated < r.length,
      s"$contaminated of ${r.length} — expected discriminative flagging")
    // a corpus checked against itself is 100% contaminated
    val docs = Tables.documents(spark, sf).limit(50)
    val self = Dedup.ngramContamination(docs, docs, "text", "doc_id", k = 5)
    assert(self.filter(!col("contaminated")).count() === 0)
  }

  test("bloom pre-filter prunes non-train n-grams and leaves the d6 result unchanged") {
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("source").isin("src0", "src1"))
    val trainDocs = docs.filter(!col("source").isin("src0", "src1"))
    // identical output with the bloom on and off (false positives are
    // killed by the exact join; bloom has no false negatives)
    def run(b: Boolean) =
      Dedup.ngramContamination(trainDocs, evalDocs, "text", "doc_id", k = 5, useBloom = b)
        .collect().map(_.toSeq).toSet
    assert(run(true) === run(false))
    // the mechanism: the filter passes every true match and prunes
    // most eval n-grams that don't occur in train
    import graft.functions.TextFunctions._
    val evalG = evalDocs.select(col("doc_id"),
      explode(shinglesK(tokens(col("text")), 5)).as("ng"))
    val trainG = trainDocs.select(explode(shinglesK(tokens(col("text")), 5)).as("ng")).distinct()
    val kept = Dedup.bloomPrefilter(evalG, "ng", trainG, "ng")
    val total = evalG.count()
    val keptN = kept.count()
    val trueHits = evalG.join(trainG, Seq("ng")).count()
    assert(keptN < total, s"bloom pruned nothing ($keptN of $total)")
    assert(keptN >= trueHits, "bloom dropped a true match (false negative)")
    assert(kept.join(trainG, Seq("ng")).count() === trueHits,
      "join result changed by the pre-filter")
  }

  test("t7 returns 20 n-grams in strictly non-increasing doc-frequency order") {
    val rows = TextOps.t7(spark, sf).collect()
    assert(rows.length === 20)
    val freqs = rows.map(_.getAs[Long]("doc_freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    assert(freqs.head >= 1)
  }

  test("simhash64 pigeonhole finds every pair within hamming 3 and spreads buckets") {
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, sf).limit(200)
    val viaB = Dedup.simhash64CandidatePairs(docs, "text", "doc_id", 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sims = docs.select(col("doc_id").as("id"), simhash64(tokenCodes(col("text"))).as("sim"))
    val brute = sims.as("a").join(sims.as("b"), col("a.id") < col("b.id"))
      .filter(bit_count(expr("a.sim ^ b.sim")) <= 3)
      .select(col("a.id"), col("b.id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaB === brute) // zero recall loss inside the radius
    // 16-bit chunk values spread far beyond the 16-bit hash's 4-bit chunks
    val spread = sims.select(
      explode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(0xffffL)): _*)).as("cv"))
      .distinct().count()
    assert(spread > 100, s"chunk-value spread: $spread")
  }

  test("per-bucket cap bounds candidate pairs on a degenerate hot-bucket corpus") {
    import spark.implicits._
    // 10k identical docs → ONE signature → every band key is a single
    // 10k-row bucket → 4 * 10k²/2 ≈ 2e8 pairs without the cap. With it,
    // the hot bucket is dropped and normal near-dup pairs still emit.
    val hot = (1L to 10000L).map(i => (i, "the same boilerplate text again and again"))
    val normal = Seq(
      (20001L, "a genuinely unique document about spark physical plans"),
      (20002L, "a genuinely unique document about spark physical plans"),
      (20003L, "an entirely different text concerning lsh candidate generation"))
    val docs = (hot ++ normal).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((20001L, 20002L))) // hot bucket gone, real pair kept
    val simPairs = Dedup.simhashCandidatePairs(docs, "text", "doc_id",
        maxHamming = 3, maxBucket = 100)
      .filter(col("id_a") >= 20000L && col("id_b") >= 20000L)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simPairs.contains((20001L, 20002L)))
    // embeddings: 5k identical vectors + one distinct near-dup pair
    val hotE = (1L to 5000L).map(i => (i, Array.fill(8)(1.0f)))
    val pairE = Seq((9001L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (9002L, Array(0.91f, 0.09f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val emb = (hotE ++ pairE).toDF("vec_id", "embedding")
    val embPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        tau = 0.99, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(embPairs === Set((9001L, 9002L)))
  }

  test("minhash LSH candidates include every exact-duplicate pair") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val exactPairs = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val candidates = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
    val missed = exactPairs.join(candidates, Seq("id_a", "id_b"), "left_anti").count()
    assert(exactPairs.count() > 0)
    assert(missed === 0)
  }

  test("hashed-key ngram stats return t7's exact top-k") {
    val viaString = TextOps.t7(spark, sf).collect().map(_.toSeq)
    val viaHash = TextOps.ngramStatsHashed(Tables.documents(spark, sf)).collect().map(_.toSeq)
    assert(viaHash.length === 20)
    assert(viaHash.zip(viaString).forall { case (a, b) => a == b })
  }

  test("dedupKeepBest keeps the highest-quality copy per cluster, not the min id") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while seven wizards watch quietly from the old stone tower nearby"
    val docs = Seq(
      (1L, base, 0.3),   // cluster {1,2,3}: doc 2 has the best score
      (2L, base, 0.9),
      (3L, base, 0.5),
      (10L, "completely different text about distributed query engines and columnar storage formats for analytical workloads at petabyte scale", 0.1))
      .toDF("doc_id", "text", "quality")
    val kept = Dedup.dedupKeepBest(docs, "text", "doc_id", "quality")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 10L), s"got $kept")
    // contrast: min-id keep drops doc 2
    val minId = Dedup.dedupNearDuplicates(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId === Set(1L, 10L))
  }

  test("t8 unigram logprobs are negative, bounded by rare-token counts") {
    val r = TextOps.t8(spark, sf).collect()
    assert(r.length === 500)
    assert(r.forall(_.getAs[Double]("avg_logprob") < 0.0),
      "every token probability < 1 so every mean log10 p is negative")
    assert(r.forall(row => row.getAs[Long]("n_rare") <= row.getAs[Long]("n_toks")))
    assert(r.forall(_.getAs[Long]("n_toks") > 0))
  }

  test("t8 tf join broadcasts when small and demotes to a shuffle join when it can't") {
    // The tf join is unhinted so the broadcast decision is SIZE-GATED:
    // a forced broadcast(tf) would OOM executors at web-corpus
    // vocabulary (1e8–1e9 tokens). Small side → broadcast-hash (AQE or
    // static); broadcast unavailable → the same query must degrade to
    // a token-keyed shuffle join with identical results, not fail.
    val promoted = TextOps.t8(spark, sf)
    val expected = promoted.collect().map(_.toSeq)
    assert(promoted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "small tf side should broadcast")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // model an over-threshold tf
      val demoted = TextOps.t8(spark, sf)
      val got = demoted.collect().map(_.toSeq)
      assert(demoted.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        "over-threshold tf side must plan a shuffle join")
      assert(got.length === expected.length)
      assert(got.zip(expected).forall { case (a, b) => a == b })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("t9 repetition: arg-max token with lexicographic ties; dup-trigram fraction counts repeats") {
    import spark.implicits._
    // the sf corpus has dup_trigram_frac = 0 everywhere (diverse
    // synthetic text), so the repeat path needs a purpose-built corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-t9").toString
    Seq(
      (1L, "a a a b"),                // top a (3/4); trigrams {a a a, a a b} all distinct
      (2L, "x y x y x y x y"),        // x/y tie at 4 → lexicographic → x; 6 trigrams, 2 distinct
      (3L, "p q"))                    // too short for trigrams → NULL fraction
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = TextOps.t9(spark, dir).collect()
      .map(row => row.getAs[Long]("doc_id") ->
        (row.getAs[Long]("n_toks"), row.getAs[String]("top_tok"),
         row.getAs[Double]("top_tok_frac"), row.getAs[java.lang.Double]("dup_trigram_frac"))).toMap
    assert(r(1L) === ((4L, "a", 0.75, java.lang.Double.valueOf(0.0))))
    assert(r(2L)._2 === "x")
    assert(r(2L)._3 === 0.5)
    assert(r(2L)._4 === java.lang.Double.valueOf(0.666667)) // 1 - 2/6 rounded at 6
    assert(r(3L)._4 === null, "docs shorter than the shingle width report NULL")
  }

  test("t10 corpus report: dup rate and token volume on a planted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t10").toString
    Seq(
      (1L, "alpha beta gamma", "en", "srcA"),   // dup pair with doc 2
      (2L, "alpha beta gamma", "en", "srcA"),
      (3L, "delta epsilon", "en", "srcA"),      // unique
      (4L, "zeta eta theta iota", "en", "srcB")) // unique
      .toDF("doc_id", "text", "lang", "source").write.parquet(s"$dir/documents.parquet")
    val r = TextOps.t10(spark, dir).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[String]("lang")) ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("total_tokens"),
         x.getAs[Long]("n_dup_docs"), x.getAs[Double]("dup_frac"))).toMap
    assert(r(("srcA", "en")) === ((3L, 8L, 2L, 2.0 / 3)))
    assert(r(("srcB", "en")) === ((1L, 4L, 0L, 0.0)))
    val q = TextOps.t10(spark, dir).collect().map(_.getAs[Double]("avg_quality"))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("d8 flags stitched/duplicated docs, not docs with minor overlap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-d8").toString
    val tenToks = (1 to 10).map(i => s"w$i").mkString(" ")  // 3 8-gram spans
    val halfShared = (1 to 8).map(i => s"w$i").mkString(" ") + " " +
      (1 to 8).map(i => s"u$i").mkString(" ")               // 9 spans, 1 shared with doc 1
    Seq(
      (1L, tenToks, "en", "srcA"),
      (2L, tenToks, "en", "srcA"),      // exact copy → shared_frac 1.0
      (3L, halfShared, "en", "srcA"),   // 1/9 shared → below threshold
      (4L, "only unique content here totally fresh words nine ten eleven twelve", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source").write.parquet(s"$dir/documents.parquet")
    val r = Dedup.d8(spark, dir).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    r.foreach { row =>
      assert(row.getAs[Long]("n_spans") === 3L)
      assert(row.getAs[Double]("shared_frac") === 1.0)
    }
  }

  test("d9 minhash estimate: identical docs agree on all 16 hashes, disjoint docs on few") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-d9").toString
    val textA = (1 to 30).map(i => s"a$i").mkString(" ")
    val textC = (1 to 30).map(i => s"c$i").mkString(" ")
    Seq((1L, textA), (2L, textA), (3L, textC))  // 2 = copy of 1; 3 disjoint
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = Dedup.d9(spark, dir).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b")) ->
        ((x.getAs[Double]("est_jac"), x.getAs[Double]("exact_jac")))).toMap
    assert(r((1L, 2L)) === ((1.0, 1.0)), "identical docs: every minhash agrees")
    val (est23, exact23) = r((2L, 3L))
    assert(exact23 === 0.0, "disjoint shingle sets")
    assert(est23 <= 0.25, s"estimate for disjoint docs stays near 0, got $est23")
    // estimates are multiples of 1/16 in [0, 1]
    r.values.foreach { case (e, _) => assert(e >= 0.0 && e <= 1.0 && (e * 16) == (e * 16).round) }
  }

  test("d10 novelty on a planted corpus: fresh=1e6 ppm, copy=0, half-copy in between") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = a // exact copy: zero novel shingles
    val freshHalf = "completely different words appear here now certainly unique tokens"
    val c = a.split(' ').take(6).mkString(" ") + " " + freshHalf
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.Dedup.d10(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_novel"), x.getAs[Long]("n_shingles"), x.getAs[Long]("novelty_ppm"))))
      .toMap
    val (nov1, n1, ppm1) = r(1L)
    assert(nov1 === n1 && ppm1 === 1000000L, "first doc: everything is novel")
    val (nov2, _, ppm2) = r(2L)
    assert(nov2 === 0L && ppm2 === 0L, "exact copy adds nothing")
    val (nov3, n3, ppm3) = r(3L)
    assert(nov3 > 0L && nov3 < n3, "half-copy is partially novel")
    assert(ppm3 === nov3 * 1000000L / n3)
  }

  test("d10 plan reuses the spans exchange for both consumers (same-key agg + join)") {
    val df = graft.operators.Dedup.d10(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the enforceable claim is the exchange COUNT: spans hash(sh) once
    // (reused by both consumers) + the doc_id agg = at most 2 hash
    // exchanges in the final plan; a re-explode-per-consumer
    // regression shows up as a third
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges <= 2,
      s"spans should shuffle once and be reused, not re-exploded per consumer " +
        s"($hashExchanges hash exchanges):\n$plan")
  }

  test("d7 clusters: every member labels to its component's min id") {
    val r = Dedup.d7(spark, sf).collect()
      .map(row => row.getAs[Long]("id") -> row.getAs[Long]("cluster"))
    assert(r.nonEmpty, "simhash hamming<=3 on consecutive docs yields some edges")
    assert(r.forall { case (id, cl) => cl <= id }, "cluster label is a min")
    val members = r.map(_._1).toSet
    assert(r.map(_._2).toSet.subsetOf(members), "labels are member ids")
  }

  test("semanticDedup prunes planted duplicate groups to their first id, keeps the rest") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // distinct vectors are pairwise ≤ 0.71 cosine; planted groups are
    // IDENTICAL vectors (cos 1.0) — identical vectors always share a
    // cell whatever the learned centroids converge to, so the
    // assertions don't hinge on k-means quality
    val rows = Seq(
      0L -> v(1, 0, 0, 0), 1L -> v(0, 1, 0, 0),
      20L -> v(0, 0, 1, 0), 21L -> v(0, 0, 0, 1),
      40L -> v(0.5, 0.5, 0.5, 0.5),
      10L -> v(1, 1, 0, 0), 11L -> v(1, 1, 0, 0), 12L -> v(1, 1, 0, 0), // group A
      30L -> v(0, 0, 1, 1), 31L -> v(0, 0, 1, 1),                       // group B
      50L -> v(0, 0, 0, 0)) // dead encoder output: no defined cosine
    val df = rows.toDF("id", "embedding")
    val out = Dedup.semanticDedup(df, "id", "embedding", k = 3, tau = 0.95).collect()
    assert(out.length === rows.length)
    val kept = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val dupOf = out.filter(!_.getBoolean(2)).map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(kept === Set(0L, 1L, 20L, 21L, 40L, 10L, 30L, 50L))
    // the zero-norm row bypasses (cell -1, kept) instead of NaN-pruning
    val z = out.find(_.getLong(0) == 50L).get
    assert(z.getLong(1) === -1L && z.getBoolean(2) && z.isNullAt(3))
    assert(dupOf === Map(11L -> 10L, 12L -> 10L, 31L -> 30L),
      "each pruned row names its group's first id (best match, tie → min id)")
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellOf(10L) === cellOf(11L) && cellOf(11L) === cellOf(12L))
    assert(cellOf(30L) === cellOf(31L))
    out.filter(!_.getBoolean(2)).foreach(r =>
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-9, "planted dups are identical: cos 1.0"))
    // MaxBucket doctrine: an oversized cell generates no pairs — with
    // maxCell=2 every cell here is over the cap, so everything is kept
    val capped = Dedup.semanticDedup(df, "id", "embedding", k = 3, tau = 0.95,
      maxCell = 2).collect()
    assert(capped.length === rows.length)
    assert(capped.forall(_.getBoolean(2)), "an oversized cell must keep everything")
  }

  test("scrubSharedSpans excises the planted duplicated passage; unique text byte-identical") {
    import spark.implicits._
    val passage = (0 until 16).map("p" + _).mkString(" ")
    val doc1 = ((0 until 4).map("u" + _) ++ Seq(passage) ++ (4 until 8).map("u" + _)).mkString(" ")
    val doc2 = ((0 until 4).map("w" + _) ++ Seq(passage) ++ (4 until 8).map("w" + _)).mkString(" ")
    // shares the passage too, but is mostly unique → below the 0.5 flag
    val doc3 = ((0 until 40).map("x" + _) ++ Seq(passage)).mkString(" ")
    val doc4 = (0 until 12).map("y" + _).mkString(" ")
    val doc5 = "z0 z1 z2" // too short for any 8-gram
    val docs = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4), (5L, doc5))
      .toDF("doc_id", "text")
    val out = Dedup.scrubSharedSpans(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // docs 1 and 2: 24 tokens, 17 spans, 9 shared (only the 8-grams
    // fully inside the passage — straddlers contain unique tokens) →
    // frac 9/17 ≈ 0.53 ≥ 0.5 → scrubbed; the passage disappears and
    // the unique prefix+suffix survive verbatim
    assert(out(1L) === ((true, 24L, 8L, (0 until 8).map("u" + _).mkString(" "))))
    assert(out(2L) === ((true, 24L, 8L, (0 until 8).map("w" + _).mkString(" "))))
    // doc 3 SHARES the passage but is below the flag → byte-identical
    assert(out(3L) === ((false, 56L, 56L, doc3)))
    assert(out(4L) === ((false, 12L, 12L, doc4)))
    assert(out(5L) === ((false, 3L, 3L, doc5)))
  }

  test("d13: incremental near-dup probing equals the full rebuild restricted to the batch") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val cut = (maxId + 1) * 9 / 10
    val inc = Dedup.incrementalNearDupPairs(
        Dedup.bandKeys(docs.filter(col("doc_id") < cut), "text", "doc_id"),
        docs.filter(col("doc_id") >= cut), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rebuild: band the WHOLE corpus, apply the same MaxBucket cap
    // (over the same full key set the incremental side caps on), keep
    // pairs whose subject is new — under the SAME bucket-head rule
    // (round 14: one partner per (subject, bucket) — the bucket's
    // smallest id, or its second-smallest when the subject is the
    // head), computed here independently via plain Scala groupBys
    val fullKeys0 = Dedup.bandKeys(docs, "text", "doc_id")
    val fullKeys = fullKeys0.withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("key"))))
      .filter(col("__bsz") <= Dedup.MaxBucket).drop("__bsz")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byBucket = fullKeys.groupBy(t => (t._2, t._3))
      .map { case (bk, xs) => bk -> xs.map(_._1).distinct.sorted.take(2) }
    val full = fullKeys.flatMap { case (id, band, key) =>
      val ms = byBucket((band, key))
      val partner = if (ms.head != id) Some(ms.head) else ms.drop(1).headOption
      partner.map(p => (id, p))
    }.filter(_._1 >= cut).distinct.toSet
    assert(inc === full, "incremental probing must be indistinguishable from a rebuild")
    assert(inc.nonEmpty)
    // the flag surface finds the planted near-dups, and at least one
    // match is an OLD doc — the persisted-index probe actually fires
    val d = Dedup.d13(spark, sf).collect()
    assert(d.length === docs.filter(col("doc_id") >= cut).count().toInt)
    val dups = d.filter(_.getBoolean(4))
    assert(dups.nonEmpty)
    assert(dups.exists(r => !r.isNullAt(2) && r.getLong(2) < cut),
      "a new doc must near-dup an OLD doc somewhere in the audit corpus")
  }

  test("d11 semantic dedup: pruning is non-trivial and keep-first consistent on the audit corpus") {
    val r = Dedup.d11(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getBoolean(2),
        if (row.isNullAt(3)) -1L else row.getLong(3)))
    assert(r.nonEmpty)
    val pruned = r.filter(!_._3)
    assert(pruned.nonEmpty, "τ sits inside the within-cell cos tail: some rows must prune")
    assert(pruned.forall { case (id, _, _, d) => d >= 0 && d < id },
      "dup_of is an EARLIER same-cell row")
    val cellOf = r.map(t => t._1 -> t._2).toMap
    assert(pruned.forall { case (_, cell, _, d) => cellOf(d) === cell },
      "dup_of never crosses a cell")
  }

  test("t15 gopher filter: one planted victim per rule; integer flags agree with the counts") {
    import spark.implicits._
    val good = (("the quick brown fox jumps over a lazy dog near river banks " * 5).trim)
    val short = "the quick a fox"                                  // fails r_len only
    val longWords = (Seq.fill(50)("extraordinarily") ++ Seq("the", "a")).mkString(" ") // mean len > 10
    val numeric = (Seq.fill(30)("123") ++ Seq.fill(20)("word") ++ Seq("the", "a")).mkString(" ") // alpha < 80%
    val noStop = Seq.fill(55)("word").mkString(" ")                // no stopwords
    val docs = Seq((1L, good), (2L, short), (3L, longWords), (4L, numeric), (5L, noStop))
      .toDF("doc_id", "text")
    val out = operators.TextOps.gopherFilter(docs, "text")
      .select("doc_id", "r_len", "r_wordlen", "r_alpha", "r_stop", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) === ((1L, 1L, 1L, 1L, 1L)), "the clean doc passes every rule")
    assert(out(2L)._1 === 0L && out(2L)._5 === 0L, "short doc fails the length rule")
    assert(out(3L)._2 === 0L, "long-word doc fails the word-length rule")
    assert(out(4L)._3 === 0L, "numeric doc fails the alpha-fraction rule")
    assert(out(5L)._4 === 0L, "stopword-free doc fails the stopword rule")
    // corpus run: flags are pure functions of the counts (recomputed here)
    val rows = operators.TextOps.t15(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val sl = r.getLong(2); val na = r.getLong(3); val ns = r.getLong(4)
      assert(r.getLong(6) === (if (n >= 50 && n <= 100000) 1L else 0L))
      assert(r.getLong(7) === (if (sl >= 3 * n && sl <= 10 * n) 1L else 0L))
      assert(r.getLong(8) === (if (5 * na >= 4 * n) 1L else 0L))
      assert(r.getLong(9) === (if (ns >= 2) 1L else 0L))
      assert(r.getLong(10) === (if (r.getLong(6) + r.getLong(7) + r.getLong(8) + r.getLong(9) == 4) 1L else 0L))
    }
  }

  test("t16 tf-idf top terms equal a plain-Scala mirror (smoothing, rounding, ties)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) => ((id, t), xs.length.toLong) } }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = tf.toSeq.map { case ((id, t), f) =>
      (id, t, f, df(t), r4(f * (math.log10((n + 1).toDouble) - math.log10((df(t) + 1).toDouble))))
    }.groupBy(_._1).flatMap { case (_, xs) =>
      xs.sortBy(x => (-x._5, x._2)).take(3).zipWithIndex
        .map { case ((id, t, f, d, s), i) => (id, t, f, d, s, i + 1) }
    }.toSet
    val got = TextOps.t16(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5))).toSet
    assert(got === want)
    assert(got.groupBy(_._1).forall(_._2.size == 3), "every doc has 3 ranked terms")
    // corpus-universal terms should land near idf ~ 0, never negative
    assert(got.forall(_._5 >= 0.0), "add-one smoothing keeps scores non-negative")
  }

  test("d14 cross-source matrix: a planted cross-source mirror lands in its cell") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-d14").toString
    val mirrored = (1 to 30).map(i => s"tok$i").mkString(" ")
    val fillers = (1 to 20).map { i =>
      (100L + i, (1 to 30).map(j => s"w${i}_$j").mkString(" "), "en",
        if (i % 2 == 0) "crawlA" else "crawlB", 100L)
    }
    (Seq(
      (1L, mirrored, "en", "crawlA", mirrored.length.toLong),
      (2L, mirrored, "en", "crawlB", mirrored.length.toLong),
      (3L, mirrored + " extra", "en", "crawlB", mirrored.length + 6L)) ++ fillers)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Dedup.d14(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1)) -> ((x.getLong(2), x.getDouble(3)))).toMap
    // doc1(A)≈doc2(B), doc1(A)≈doc3(B) cross cells; doc2≈doc3 within B
    assert(r.contains(("crawlA", "crawlB")), "the mirror cell must appear")
    assert(r(("crawlA", "crawlB"))._1 >= 2L, "both cross-source near-dup pairs counted")
    assert(r(("crawlA", "crawlB"))._2 === 1.0, "identical docs peak the cell at jac 1")
    assert(r.contains(("crawlB", "crawlB")), "within-source duplication on the diagonal")
    // unrelated filler docs must not create cells on their own
    assert(r.keySet.subsetOf(Set(("crawlA", "crawlB"), ("crawlB", "crawlB"),
      ("crawlA", "crawlA"))))
    // canonical ordering: source_a <= source_b in every cell
    assert(r.keySet.forall { case (a, b) => a <= b })
  }

  test("d14 and mm8 results are invariant to spark.sql.shuffle.partitions") {
    // bucket-join + capped-window + rounded-output operators must not
    // change answers when the one knob a 100 TB operator retunes most
    // (st14's invariance gate applied to the two newest bucket joins)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(parts: String)(f: => org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try f.collect().map(_.toSeq).toSet
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run("2")(Dedup.d14(spark, sf)) === run("9")(Dedup.d14(spark, sf)))
    assert(run("2")(graft.operators.Multimodal.mm8(spark, sf)) ===
      run("9")(graft.operators.Multimodal.mm8(spark, sf)))
  }

  test("MinHashSigExpr is bit-identical to the HOF fold; empty codes stay null") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions.{transform => htransform}
    assert(spark.catalog.functionExists("graft_minhash"))
    // the HOF reference, inlined (minhashSignature itself routes fused)
    def hofSig(codes: org.apache.spark.sql.Column) = {
      val a = array((0 until MinhashK).map(i => lit(permA(i))): _*)
      val b = array((0 until MinhashK).map(i => lit(permB(i))): _*)
      when(size(codes) > 0,
        aggregate(codes, array_repeat(lit(P), MinhashK),
          (acc, c) => zip_with(acc,
            htransform(sequence(lit(0), lit(MinhashK - 1)),
              i => (c * element_at(a, i + 1) + element_at(b, i + 1)) % P),
            (m, x) => least(m, x))))
        .otherwise(lit(null).cast("array<bigint>"))
    }
    val r = Tables.documents(spark, sf)
      .select(call_function("graft_minhash", shingleCodes(col("text"))).as("fused"),
        hofSig(shingleCodes(col("text"))).as("hof")).collect()
    r.foreach { row =>
      assert(row.isNullAt(0) === row.isNullAt(1))
      if (!row.isNullAt(0)) assert(row.getSeq[Long](0) === row.getSeq[Long](1))
    }
    import spark.implicits._
    val empty = Seq("a b").toDF("text") // 2 tokens -> zero 3-gram shingles
      .select(call_function("graft_minhash", shingleCodes(col("text"))))
      .collect()(0)
    assert(empty.isNullAt(0), "empty shingle set must keep the null contract")
  }

  test("SimHashExpr is bit-identical to the HOF folds (16 and 64 bit); empty codes give 0") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions.{transform => htransform}
    assert(spark.catalog.functionExists("graft_simhash_codes"))
    def hof16(codes: org.apache.spark.sql.Column) = {
      val pows = array((0 until SimBits).map(i => lit(1L << i)): _*)
      aggregate(codes, array_repeat(lit(0L), SimBits + 1),
        (acc, c) => zip_with(acc,
          concat(htransform(sequence(lit(0), lit(SimBits - 1)),
            b => when(((c * 1103515245L + 12345L) % P)
              .bitwiseAND(element_at(pows, b + 1)) > 0, lit(1L)).otherwise(0L)),
            array(lit(1L))),
          (s, x) => s + x),
        acc => (0 until SimBits).map(b =>
          when(element_at(acc, b + 1) * 2 > element_at(acc, SimBits + 1), lit(1L << b))
            .otherwise(0L)).reduce(_ + _))
    }
    def hof64(codes: org.apache.spark.sql.Column) =
      aggregate(codes, array_repeat(lit(0L), 65),
        (acc, c) => zip_with(acc,
          concat(htransform(sequence(lit(0), lit(63)),
            b => (((c * 1103515245L + b * 2654435761L + 12345L) % P) * 48271L % P) % 2),
            array(lit(1L))),
          (s, x) => s + x),
        acc => (0 until 64).map(b =>
          when(element_at(acc, b + 1) * 2 > element_at(acc, 65), lit(1L << b))
            .otherwise(0L)).reduce(_ + _))
    val r = Tables.documents(spark, sf)
      .select(
        call_function("graft_simhash_codes", tokenCodes(col("text")), lit(16)).as("f16"),
        hof16(tokenCodes(col("text"))).as("h16"),
        call_function("graft_simhash_codes", tokenCodes(col("text")), lit(64)).as("f64"),
        hof64(tokenCodes(col("text"))).as("h64")).collect()
    r.foreach { row =>
      assert(row.getLong(0) === row.getLong(1), "16-bit sketch diverges")
      assert(row.getLong(2) === row.getLong(3), "64-bit sketch diverges")
    }
    import spark.implicits._
    val z = Seq("").toDF("t")
      .select(call_function("graft_simhash_codes",
        lit(Array.empty[Long]), lit(64))).collect()(0).getLong(0)
    assert(z === 0L, "empty codes sketch to 0 (the HOF contract)")
  }

  test("fused sketch edge contract: null slots match the HOF; overflow-scale codes stay defined") {
    import graft.functions.TextFunctions._
    import spark.implicits._
    // --- null slots. HOF minhash skips them (least(m, null) = m); HOF
    // simhash nulls every bit-sum so every strict-majority test fails
    // (result 0). The fused expressions must reproduce both exactly.
    val nullBearing = Seq(
      (1L, Seq(Option(5L), None, Option(900000007L))),
      (2L, Seq(Option(5L), Option(900000007L))), // the non-null subset of row 1
      (3L, Seq[Option[Long]](None))).toDF("id", "codes")
    val mh = nullBearing
      .select(col("id"), minhashSignature(col("codes")).as("f"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(mh(1L) === mh(2L), "null slot must be SKIPPED, exactly like the HOF least-skip")
    assert(mh(3L) === Seq.fill(MinhashK)(P), "all-null codes leave the initial [P..P] accumulator")
    val sh = nullBearing
      .select(col("id"), simhash16(col("codes")).as("f16"), simhash64(col("codes")).as("f64"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sh(1L) === ((0L, 0L)), "a null code nulls every HOF bit-sum -> sketch 0")
    assert(sh(3L) === ((0L, 0L)))
    // the HOF folds themselves agree (inlined reference, null-bearing input)
    val a = array((0 until MinhashK).map(i => lit(permA(i))): _*)
    val b = array((0 until MinhashK).map(i => lit(permB(i))): _*)
    val hofMh = nullBearing.filter(col("id") === 1L).select(
      aggregate(col("codes"), array_repeat(lit(P), MinhashK),
        (acc, c) => zip_with(acc,
          org.apache.spark.sql.functions.transform(sequence(lit(0), lit(MinhashK - 1)),
            i => (c * element_at(a, i + 1) + element_at(b, i + 1)) % P),
          (m, x) => least(m, x)))).collect()(0).getSeq[Long](0)
    assert(hofMh === mh(1L))
    // --- overflow-scale codes (≈2^40: the HOF's c·permA product wraps
    // past Long.MaxValue — ANSI throws, pre-ANSI silently wraps). The
    // fused eval pre-reduces c % P, so it stays defined and, because
    // mod is a homomorphism, equals the fused sketch of the reduced
    // codes bit-for-bit.
    val big = Seq((1L, Seq(1099511627776L, 7L)),
      (2L, Seq(1099511627776L % P, 7L))).toDF("id", "codes")
    val bigR = big.select(col("id"), minhashSignature(col("codes")).as("mh"),
        simhash16(col("codes")).as("s16"), simhash64(col("codes")).as("s64"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2), r.getLong(3)))).toMap
    assert(bigR(1L) === bigR(2L), "pre-reduction must be invisible mod P")
  }

  test("d18 audit: radius-2 covers every bucket at planes=2 (ann == exact), dials match the sizing rules") {
    val r = Dedup.d18(spark, sf).collect()
    assert(r.length === 1)
    val row = r(0)
    val n = row.getLong(0)
    assert(row.getLong(1) === Dedup.sizedCells(n, 25).toLong, "k must follow sizedCells")
    assert(row.getLong(2) ===
      graft.operators.Similarity.sizedPlanes(row.getLong(1), 8).toLong,
      "planes must follow sizedPlanes(k, 8)")
    // at sf0.001 planes = 2 and the Hamming-2 probe set is ALL 2^2
    // buckets, so ANN assignment degenerates to exact assignment —
    // the audit must report EXACT agreement, zero misses, full recall
    assert(row.getLong(2) === 2L)
    assert(row.getLong(3) === 1000000L, "agree_ppm: radius 2 over 4 buckets is exhaustive")
    assert(row.getLong(4) === 0L, "miss_ppm")
    assert(row.getLong(7) === 1000000L, "dup_recall_ppm")
  }

  test("d18 AuditCap branch: capped audit == uncapped audit on the hash-preselected subset") {
    // the cap keeps the audit's designed-quadratic exact side bounded
    // at scale (×100 measured 1069 s uncapped); this proves the
    // sampling branch changes the INPUT, never the mechanism: running
    // with cap=10 must equal running uncapped on the 10 rows the
    // portable selector would pick
    val P = 2147483647L
    val e = Tables.embeddings(spark, sf)
    val capped = Dedup.annAssignRecallAudit(spark, e, cap = 10L).collect()
    val pickedIds = e
      .filter(graft.functions.VectorFunctions.normSq(col("embedding")) > 0)
      .orderBy(
        pmod(pmod(pmod(col("vec_id"), lit(P)) * 1103515245L
          + 181L * 2654435761L + 12345L, lit(P)) * 48271L, lit(P)),
        col("vec_id"))
      .limit(10).select(col("vec_id")).collect().map(_.getLong(0))
    assert(pickedIds.length === 10)
    val manual = Dedup.annAssignRecallAudit(spark,
      e.filter(col("vec_id").isin(pickedIds: _*)), cap = Long.MaxValue).collect()
    assert(capped.map(_.toString).toSeq === manual.map(_.toString).toSeq)
    assert(capped(0).getLong(0) === 10L, "audited n is the cap")
  }

  test("d16 leakage-safe split: planted duplicates never straddle; the naive split leaks") {
    import spark.implicits._
    // ids 5 and 7 share text: naive id%5 puts 5 in test and 7 in train
    // (the leak); cluster-keyed split sends BOTH to gmin=5's side
    val docs = Seq(
      (5L, "shared duplicate body of text"),
      (7L, "shared duplicate body of text"),
      (10L, "another repeated page"), (11L, "another repeated page"),
      (1L, "unique one"), (2L, "unique two"), (3L, "unique three"))
      .toDF("doc_id", "text")
    val split = Dedup.leakageSafeSplit(docs, "text", "doc_id")
      .select(col("doc_id"), col("text"), col("is_test")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    // every text group single-sided
    split.groupBy(_._2).foreach { case (t, rs) =>
      assert(rs.map(_._3).toSet.size === 1, s"group '$t' straddles the split")
    }
    val side = split.map(r => r._1 -> r._3).toMap
    assert(side(5L) && side(7L), "the 5/7 duplicate cluster follows gmin=5 into test")
    assert(side(10L) && side(11L), "the 10/11 cluster follows gmin=10 into test")
    // the leak this prevents: the naive per-doc rule splits group 5/7
    val naive = split.map(r => r._1 -> (r._1 % 5 == 0)).toMap
    assert(naive(5L) !== naive(7L), "fixture must demonstrate the naive straddle")
    // the registered summary conserves docs and tokens across sides
    val rep = Dedup.d16(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep.keySet === Set("train", "test"))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rep.values.map(_._1).sum === nDocs)
  }

  test("sizedCells: cells grow with the corpus so cell population stays pinned") {
    assert(Dedup.sizedCells(100) === 1)
    assert(Dedup.sizedCells(500) === 1)
    assert(Dedup.sizedCells(501) === 2)
    assert(Dedup.sizedCells(20000) === 40, "x10-of-sf0.1 wants 40 cells, not a fixed 6")
    val ns = Seq(100L, 1000L, 10000L, 1000000L)
    assert(ns.map(Dedup.sizedCells(_)) === ns.map(Dedup.sizedCells(_)).sorted)
    ns.foreach { n =>
      assert(n.toDouble / Dedup.sizedCells(n) <= 500.0, s"cell population blew past target at N=$n")
    }
    // the learned path accepts the sized k end to end (tiny corpus)
    import spark.implicits._
    val v = (1 to 30).map(i => (i.toLong, Array.fill(4)(((i % 3) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(v, "vec_id", "embedding",
      k = Dedup.sizedCells(30), tau = 0.99, iters = 2)
    assert(r.count() === 30L)
  }

  test("d17 ANN-assisted sized-k dedup: every dup is a true >=tau neighbor; misses kept; twins collapse") {
    import spark.implicits._
    // planted: 8 groups of 5 identical unit-pattern vectors (the mean
    // of a group IS the member vector, so the group's centroid shares
    // its members' probe buckets whenever one seeds/learns nearby)
    val dir = java.nio.file.Files.createTempDirectory("graft-d17").toString
    val vecs = for (g <- 0 until 8; m <- 0 until 5) yield {
      val v = Array.tabulate(16)(d => if (d == g * 2) 1.0f else if (d == g * 2 + 1) 0.5f else 0f)
      ((g * 10 + m).toLong, v, g)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = Dedup.d17(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(rows.length === 40, "one verdict per vector")
    assert(rows.forall(_._2 >= -2L), "cells are learned ids, -1 (zero norm) or -2 (probe miss)")
    // every pruned row names an EARLIER member of its own group
    rows.filter(!_._3).foreach { case (id, _, _, dupOf) =>
      assert(dupOf >= 0 && dupOf / 10 === id / 10 && dupOf < id,
        s"$id pruned against $dupOf — not an earlier same-group twin")
    }
    // non-vacuous: most identical twins collapse (ANN misses may keep
    // a few extra rows — the conservative direction — but the planted
    // geometry routes the bulk)
    val pruned = rows.count(!_._3)
    assert(pruned >= 16, s"only $pruned of 32 possible twins pruned — assignment too lossy")
    // and on the real corpus the registered form runs end to end
    val real = Dedup.d17(spark, sf).collect()
    assert(real.length === Tables.embeddings(spark, sf).count())
    real.filter(!_.getBoolean(2)).foreach { r =>
      assert(r.getDouble(4) >= Dedup.SemTau - 5e-7, "dup under tau")
    }
  }

  test("d15 learned-cell dedup: cells from the k=6 codebook; dup pairs same-cell, over tau, keep-first") {
    val rows = Dedup.d15(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length === n, "one verdict row per input vector")
    val cells = rows.map(_.getLong(1)).toSet
    assert(cells.subsetOf((-1L until Dedup.SemK.toLong).toSet),
      s"cells must be -1 (zero-norm bypass) or [0, ${Dedup.SemK}): got $cells")
    assert(cells.count(_ >= 0) > 1, "training collapsed to a single cell")
    val cellOf = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(r => !r.getBoolean(2)).foreach { r =>
      val (id, dupOf, cos) = (r.getLong(0), r.getLong(3), r.getDouble(4))
      assert(dupOf < id, "keep-first: dup_of must be an earlier id")
      assert(cellOf(dupOf) === cellOf(id), "dup pairs only exist within a cell")
      assert(cos >= Dedup.SemTau - 5e-7, s"dup cos $cos under tau")
    }
  }

  test("d19 bloom audit: zero false negatives, planted corpora pin both extremes, sizing rule") {
    import spark.implicits._
    // Corpus-wide invariant at the gate SF: a true train hit can never
    // fail the bloom (its positions ARE in the train position set).
    val r = Dedup.d19(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("n_fn") === 0L), s"bloom false negative: ${r.mkString(",")}")
    assert(r.forall(x => x.getAs[Long]("n_pass") >= x.getAs[Long]("n_true")))

    // Planted extreme 1: eval text == train text -> every eval n-gram
    // is a true hit, everything passes, zero FP, zero reduction.
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val same = Seq(("ev", shared), ("tr", shared)).toDF("source", "text")
    val s1 = Dedup.bloomAudit(same, Seq("ev")).collect().head
    assert(s1.getAs[Long]("n_pass") === s1.getAs[Long]("n_ngrams"))
    assert(s1.getAs[Long]("n_true") === s1.getAs[Long]("n_ngrams"))
    assert(s1.getAs[Long]("n_fn") === 0L)
    assert(s1.getAs[Long]("fp_ppm") === 0L)
    assert(s1.getAs[Long]("reduction_ppm") === 0L)

    // Planted extreme 2: disjoint vocabularies -> zero true hits; with
    // a near-empty filter (tiny train set in a >=2^10-bit domain) the
    // bloom must also PASS ~nothing: reduction near 1e6.
    val disj = Seq(
      ("ev", "one two three four five six seven eight nine ten"),
      ("tr", "uno dos tres cuatro cinco seis siete ocho nueve diez")).toDF("source", "text")
    val s2 = Dedup.bloomAudit(disj, Seq("ev")).collect().head
    assert(s2.getAs[Long]("n_true") === 0L)
    assert(s2.getAs[Long]("n_fn") === 0L)
    assert(s2.getAs[Long]("reduction_ppm") >= 900000L,
      s"near-empty bloom passed too much: $s2")

    // Sizing rule: smallest power of two >= bitsPerKey*n, clamped.
    assert(Dedup.bloomBitsExp(1) === 10)
    assert(Dedup.bloomBitsExp(128) === 10)       // 8*128 = 2^10
    assert(Dedup.bloomBitsExp(129) === 11)
    assert(Dedup.bloomBitsExp(Long.MaxValue / 16) === 30) // clamp
    val exps = Seq(100L, 1000L, 10000L, 100000L).map(Dedup.bloomBitsExp(_))
    assert(exps === exps.sorted, "sizing must be monotone in n")
  }
}
