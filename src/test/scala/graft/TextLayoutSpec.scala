package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.TextOps

/** t12 sequence packing + t13 token-budget sampling: semantics are
  * re-derived in plain Scala on the collected (source, doc_id, n_tok,
  * quality) tuples — an in-process oracle independent of Spark's
  * window/aggregate machinery (token/quality parity itself is t1/t2's
  * DuckDB oracle's job). Plan shape is asserted too: both operators
  * claim ONE data shuffle (the window's hash-by-source), with the
  * aggregation reusing that partitioning.
  */
class TextLayoutSpec extends SparkSuite {

  private def docTuples = Tables.documents(spark, sf)
    .select(col("source"), col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"),
      round(qualityScore(col("text")), 6).as("quality"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("t12 packs like a plain-Scala concat-and-split (per source, all invariants)") {
    val C = TextOps.packCapacity
    // independent reimplementation: walk docs in doc_id order per
    // source, chunk = tokens-before div C
    val expected = docTuples.groupBy(_._1).flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy(_._2).map { case (_, _, n, _) =>
        val chunk = cum / C; cum += n; (src, chunk, n)
      }.groupBy(_._2).map { case (chunk, rows) =>
        (src, chunk) -> (rows.size.toLong, rows.map(_._3).sum)
      }
    }
    val got = TextOps.t12(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (nDocs, nTok)) =>
      val (gDocs, gTok, gFill) = got(k)
      assert((gDocs, gTok) === ((nDocs, nTok)), s"chunk $k")
      // gFill is round(·, 6) (HALF_UP, like Spark's round) — mirror it
      val expFill = BigDecimal(nTok.toDouble / C)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gFill === expFill, s"fill_frac $k")
    }
    // structural invariants: chunk ids contiguous from 0; tokens
    // conserved; all chunks before chunk k hold ≥ k*C tokens (the
    // concat-and-split guarantee that only the straddling doc spills)
    expected.groupBy(_._1._1).foreach { case (src, chunks) =>
      val ids = chunks.keys.map(_._2).toSeq.sorted
      assert(ids === (0L until ids.size).toSeq, s"$src chunk ids not contiguous")
      val byId = chunks.map { case ((_, id), (_, t)) => id -> t }
      ids.dropRight(1).foreach { k =>
        val before = (0L to k).map(byId).sum
        assert(before >= (k + 1) * C,
          s"$src: chunks 0..$k hold $before < ${(k + 1) * C} tokens")
      }
    }
    val totalExpected = docTuples.map(_._3).sum
    assert(expected.values.map(_._2).sum === totalExpected, "tokens not conserved")
  }

  test("t13 keeps a quality-prefix per source within the token budget") {
    val B = TextOps.tokenBudget
    val expected = docTuples.groupBy(_._1).map { case (src, docs) =>
      val walk = docs.sortBy { case (_, id, _, q) => (-q, id) }
      var cum = 0L
      val kept = walk.takeWhile { case (_, _, n, _) =>
        val take = cum < B; if (take) cum += n; take
      }
      src -> (docs.size.toLong, kept.size.toLong, kept.map(_._3).sum,
        docs.map(_._3).sum, kept.map(_._4).min)
    }
    val got = TextOps.t13(spark, sf).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (src, (nDocs, nKept, keptTok, totTok, minQ)) =>
      val (gDocs, gKept, gKeptTok, gTotTok, gMinQ, gFrac) = got(src)
      assert((gDocs, gKept, gKeptTok, gTotTok) === ((nDocs, nKept, keptTok, totTok)), src)
      assert(math.abs(gMinQ - minQ) < 1e-6, s"$src min_kept_quality")
      assert(math.abs(gFrac - keptTok.toDouble / totTok) < 1e-6, s"$src kept_frac")
      // greedy guarantee: the budget is spent (or the source exhausted),
      // and the kept set never undershoots an attainable budget
      assert(keptTok >= math.min(B, totTok), s"$src undershoots the budget")
    }
  }

  test("t12/t13 window logic matches the plain-Scala oracle on 10 seeded random corpora") {
    import spark.implicits._
    val C = TextOps.packCapacity
    val B = TextOps.tokenBudget
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // random corpus: 1-4 sources, docs of 0-900 tokens (some empty,
      // some straddling several chunks), duplicate-ish quality scores
      val docs = (0 until 40 + rnd.nextInt(60)).map { i =>
        val words = Seq.fill(rnd.nextInt(900))("w" + rnd.nextInt(50)).mkString(" ")
        (i.toLong, words, "src" + rnd.nextInt(1 + rnd.nextInt(4)))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-rand$seed").toString
      docs.toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val meta = Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"),
          round(qualityScore(col("text")), 6).as("quality"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // t12 oracle
      val wantPack = meta.groupBy(_._1).flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, _, n, _) =>
          val ch = cum / C; cum += n; (src, ch, n)
        }.groupBy(_._2).map { case (ch, rs) => (src, ch) -> (rs.size.toLong, rs.map(_._3).sum) }
      }
      val gotPack = TextOps.t12(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(gotPack === wantPack, s"t12 diverged at seed=$seed")
      // t13 oracle
      val wantBudget = meta.groupBy(_._1).map { case (src, ds) =>
        var cum = 0L
        val kept = ds.sortBy { case (_, id, _, q) => (-q, id) }.takeWhile { case (_, _, n, _) =>
          val t = cum < B; if (t) cum += n; t
        }
        src -> ((kept.size.toLong, kept.map(_._3).sum, ds.map(_._3).sum))
      }
      val gotBudget = TextOps.t13(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(gotBudget === wantBudget, s"t13 diverged at seed=$seed")
    }
  }

  test("t14 terciles: per-lang bucket sizes within 1, scores monotone across buckets") {
    val rows = TextOps.t14(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("ppl_bucket"),
        r.getAs[Double]("avg_logprob"), r.getAs[String]("bucket")))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, b, _, lbl) =>
      (b, lbl) match {
        case (1L, "head") | (2L, "middle") | (3L, "tail") => true
        case _ => false
      }
    }, "bucket label must match the tercile id")
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._2).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)))
      if (rs.size >= 3) {
        assert(sizes.values.max - sizes.values.min <= 1,
          s"$lang terciles must be balanced: $sizes")
        // head scores >= middle scores >= tail scores (ties may
        // straddle a boundary, so >= not >)
        def min1(b: Long) = rs.filter(_._2 == b).map(_._3).min
        def max1(b: Long) = rs.filter(_._2 == b).map(_._3).max
        assert(min1(1L) >= max1(2L) && min1(2L) >= max1(3L),
          s"$lang buckets not score-monotone")
      }
    }
  }

  // ------------------------------------------------------------------
  // Scale-path variants (round-9): the map-side/threshold forms that
  // replace the per-source / per-lang total-order windows at 100 TB.

  test("t13ByThreshold (scale path) reproduces t13 bit-exactly with boundary resolution") {
    val exact = TextOps.t13(spark, sf).collect().map(_.toSeq).toSeq
    val thr = TextOps.t13ByThreshold(spark, sf).collect().map(_.toSeq).toSeq
    assert(thr === exact)
  }

  test("t13ByThreshold == t13 on 5 seeded random corpora (degenerate shapes included)") {
    import spark.implicits._
    (11 to 15).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 40 + rnd.nextInt(60)).map { i =>
        val words = Seq.fill(rnd.nextInt(900))("w" + rnd.nextInt(50)).mkString(" ")
        (i.toLong, words, "src" + rnd.nextInt(1 + rnd.nextInt(4)))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-thr$seed").toString
      docs.toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val exact = TextOps.t13(spark, dir).collect().map(_.toSeq).toSeq
      val thr = TextOps.t13ByThreshold(spark, dir).collect().map(_.toSeq).toSeq
      assert(thr === exact, s"seed=$seed")
    }
  }

  test("t13 threshold stays bit-exact as bins coarsen (boundary pass carries the slack)") {
    // bins=16 makes quality strata huge — the histogram cut gets
    // coarse and the boundary-stratum walk does most of the work; the
    // composition must stay bit-equal to the greedy form regardless
    val exact = TextOps.t13(spark, sf).collect().map(_.toSeq).toSeq
    Seq(16, 1000) foreach { bins =>
      val thr = TextOps.tokenBudgetByThreshold(
          Tables.documents(spark, sf), "text", "source", "doc_id",
          TextOps.tokenBudget, bins = bins)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept").cast("long")).as("n_kept"),
          sum(col("n_tok") * col("kept").cast("long")).as("kept_tokens"),
          sum(col("n_tok")).as("total_tokens"),
          round(min(when(col("kept"), col("quality"))), 6).as("min_kept_quality"))
        .withColumn("kept_frac",
          round(col("kept_tokens").cast("double") / col("total_tokens"), 6))
        .orderBy(col("source"))
        .collect().map(_.toSeq).toSeq
      assert(thr === exact, s"bins=$bins diverged")
    }
  }

  test("t13 threshold without boundary resolution: kept ⊆ exact, misses confined to ONE stratum") {
    val B = TextOps.tokenBudget
    val bins = 100000L
    // exact greedy per-doc kept set (plain Scala)
    val exactKept = docTuples.groupBy(_._1).values.flatMap { ds =>
      var cum = 0L
      ds.sortBy { case (_, id, _, q) => (-q, id) }.flatMap { case (_, id, n, _) =>
        val take = cum < B; if (take) cum += n; if (take) Some(id) else None
      }
    }.toSet
    val perDoc = TextOps.tokenBudgetByThreshold(
      Tables.documents(spark, sf), "text", "source", "doc_id",
      B, resolveBoundary = false).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(4)))
    val thrKept = perDoc.filter(_._3).map(_._2).toSet
    assert(thrKept.subsetOf(exactKept),
      "threshold form must never keep a doc the exact greedy drops")
    // every missed doc sits in its source's single cut stratum
    val qbin = docTuples.map(t => t._2 -> math.min((t._4 * bins).toLong, bins - 1)).toMap
    val srcOf = docTuples.map(t => t._2 -> t._1).toMap
    (exactKept -- thrKept).groupBy(srcOf).foreach { case (src, missed) =>
      assert(missed.map(qbin).size === missed.size && missed.map(qbin).toSet.size <= 1,
        s"$src: missed docs span more than one quality stratum")
    }
  }

  test("t14ByThreshold (scale path) is BIT-EXACT vs ntile with tie resolution") {
    val exact = TextOps.t14(spark, sf).collect().map(_.toSeq).toSeq
    val thr = TextOps.t14ByThreshold(spark, sf).collect().map(_.toSeq).toSeq
    assert(thr === exact)
  }

  test("t14 threshold-only form: ≥97% agreement, disagreements tied-at-a-cut and adjacent") {
    val exact = TextOps.t14(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    val thr = TextOps.t14ByThreshold(spark, sf, resolveTies = false).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(thr.keySet === exact.keySet)
    val n = exact.size
    val bad = exact.filter { case (id, (_, _, b)) => thr(id)._3 != b }
    info(s"bucket agreement: ${n - bad.size}/$n = ${(n - bad.size).toDouble / n}")
    assert((n - bad.size).toDouble / n >= 0.97,
      s"agreement ${(n - bad.size).toDouble / n} below 0.97")
    bad.foreach { case (id, (lang, s, b)) =>
      // off-by-one bucket, always promoted (ties land in the UPPER
      // bucket), and the score is genuinely tied: some other doc of
      // the same lang shares it
      assert(math.abs(thr(id)._3 - b) === 1, s"doc $id jumped two buckets")
      assert(thr(id)._3 < b, s"doc $id was demoted — thresholds can only promote ties")
      assert(exact.exists { case (id2, (l2, s2, _)) => id2 != id && l2 == lang && s2 == s },
        s"doc $id disagreed without a tied score")
    }
  }

  test("seqPackSharded: every shard's chunks equal concat-and-split run on that shard alone") {
    val C = TextOps.packCapacity
    val nShards = 4L
    val got = TextOps.seqPackSharded(Tables.documents(spark, sf),
        "text", "source", "doc_id", pmod(col("doc_id"), lit(nShards)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // plain-Scala oracle, independently per (source, shard)
    val expected = docTuples.groupBy(t => (t._1, t._2 % nShards)).flatMap {
      case ((src, sh), ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, _, n, _) =>
          val ch = cum / C; cum += n; (ch, n)
        }.groupBy(_._1).map { case (ch, rs) =>
          (src, sh, ch) -> ((rs.size.toLong, rs.map(_._2).sum))
        }
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (nDocs, nTok)) =>
      val (gDocs, gTok, gFill) = got(k)
      assert((gDocs, gTok) === ((nDocs, nTok)), s"chunk $k")
      val expFill = BigDecimal(nTok.toDouble / C)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gFill === expFill, s"fill_frac $k")
    }
    // tokens conserved vs the unsharded form
    val unshardedTok = TextOps.t12(spark, sf).collect().map(_.getLong(3)).sum
    assert(got.values.map(_._2).sum === unshardedTok, "tokens not conserved")
    // concat-and-split guarantee per (source, shard): cumulative
    // tokens through every non-trailing chunk k cover ≥ (k+1)·C —
    // only the doc straddling a boundary spills past it. (Per-chunk
    // fill ≥ 1 is NOT an invariant: the chunk after a multi-capacity
    // straddler starts mid-window and can be short.)
    def cumInvariant(rows: Map[(String, Long, Long), (Long, Long, Double)],
        label: String): Seq[Double] =
      rows.groupBy { case ((src, sh, _), _) => (src, sh) }.toSeq.flatMap { case (g, cs) =>
        val byId = cs.map { case ((_, _, ch), (_, t, f)) => ch -> ((t, f)) }
        val ids = byId.keys.toSeq.sorted
        var cum = 0L
        ids.dropRight(1).foreach { k =>
          cum = ids.filter(_ <= k).map(byId(_)._1).sum
          assert(cum >= (k + 1) * C, s"$label $g: through chunk $k only $cum tokens")
        }
        ids.dropRight(1).map(k => byId(k)._2)
      }
    val shardedFills = cumInvariant(got, "sharded")
    val unsharded = TextOps.t12(spark, sf).collect()
      .map(r => (r.getString(0), 0L, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val unshardedFills = cumInvariant(unsharded, "unsharded")
    if (shardedFills.nonEmpty && unshardedFills.nonEmpty) {
      val (ms, mu) =
        (shardedFills.sum / shardedFills.size, unshardedFills.sum / unshardedFills.size)
      info(s"mean non-trailing fill: sharded $ms vs unsharded $mu")
      assert(math.abs(ms - mu) / mu < 0.05, s"fill distribution moved: $ms vs $mu")
    }
  }

  test("t12/t13 plan exactly one data shuffle; the chunk agg reuses the window partitioning") {
    Seq(TextOps.t12(spark, sf), TextOps.t13(spark, sf)).foreach { df =>
      df.collect() // finalize the adaptive plan
      // AQE's toString prints BOTH the final and the initial plan —
      // count exchanges in the final section only
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val hash = "Exchange hashpartitioning".r.findAllIn(plan).size
      val range = "Exchange rangepartitioning".r.findAllIn(plan).size
      assert(hash === 1, s"expected ONE hash exchange (window by source), got $hash:\n$plan")
      assert(range <= 1, s"only the presentation ORDER BY may range-shuffle:\n$plan")
    }
  }

  test("corpusShuffle: fixed shard sizes, two-level rank == global rank, seed-deterministic, composes") {
    val docs = Tables.documents(spark, sf)
    val sh = TextOps.corpusShuffle(docs, "doc_id", shardSize = 8L)
      .select(col("doc_id"), col("__h"), col("shard"))
    val got = sh.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // two-level rank equals the plain global (h, id) sort
    val want = got.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, h, _), i) => id -> (i.toLong / 8L) }.toMap
    assert(got.map(t => t._1 -> t._3).toMap === want,
      "bucketed offset + local rank must reproduce the global hash order")
    // fixed-size shards: every shard but the last is exactly shardSize
    val sizes = got.groupBy(_._3).toSeq.sortBy(_._1).map(_._2.length)
    assert(sizes.dropRight(1).forall(_ === 8), s"non-final shards must be full: $sizes")
    // seeded: same seed reproduces, a different seed reorders
    val again = TextOps.corpusShuffle(docs, "doc_id", shardSize = 8L)
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got.map(t => t._1 -> t._3).toMap)
    val reseeded = TextOps.corpusShuffle(docs, "doc_id", seed = 777L, shardSize = 8L)
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reseeded !== again, "a new seed must produce a different layout")
    // it must actually SHUFFLE: shard assignment not monotone in id
    // (the single-multiply hash failed exactly this — it never wrapped
    // for small ids, so the "shuffle" preserved crawl order)
    val byId = got.map(t => t._1 -> t._3).toSeq.sortBy(_._1).map(_._2)
    assert(byId.sliding(2).exists(p => p(0) > p(1)),
      "shard order must not preserve doc_id order")
    // shuffle-partition invariance (the knob a 100 TB run retunes most)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runParts(p: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try TextOps.corpusShuffle(docs, "doc_id", shardSize = 8L)
        .select(col("doc_id"), col("shard")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(runParts("2") === runParts("9"))
    // composes with seqPackSharded: shards are the packing sub-key and
    // token volume is conserved through the composition
    val packed = TextOps.seqPackSharded(
      TextOps.corpusShuffle(docs, "doc_id", shardSize = 8L),
      "text", "source", "doc_id", col("shard"))
    val totTok = docs.select(sum(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")))
      .head().getLong(0)
    assert(packed.agg(sum(col("n_tokens"))).head().getLong(0) === totTok,
      "every token lands in exactly one chunk of one shard")
  }

  test("corpusShuffle two-level rank == global sort on 5 seeded random id shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { t =>
      val n = 50 + rnd.nextInt(300)
      val ids = scala.collection.mutable.LinkedHashSet[Long]()
      while (ids.size < n) ids += (rnd.nextLong() & 0x3FFFFFFFFFFL) // sparse ids up to 2^42
      val df = ids.toSeq.map(i => (i, s"w$i", "s")).toDF("doc_id", "text", "source")
      val shardSize = 1L + rnd.nextInt(20)
      val seed = rnd.nextInt(1 << 30).toLong
      val got = TextOps.corpusShuffle(df, "doc_id", seed, shardSize)
        .select(col("doc_id"), col("__h"), col("shard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = got.sortBy(x => (x._2, x._1)).zipWithIndex
        .map { case ((id, _, _), i) => id -> (i.toLong / shardSize) }.toMap
      assert(got.map(x => x._1 -> x._3).toMap === want,
        s"shape $t (n=$n shardSize=$shardSize seed=$seed): two-level rank diverged")
    }
  }

  test("tokenBudgetByThreshold spends a BPE-corrected budget when given t22's counts") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    // budget in BPE units: pass the merge-accurate counter directly
    val bpe = TextOps.tokenBudgetByThreshold(docs, "text", "source", "doc_id",
      budget = 4000L, nTok = t => TextOps.bpeTokenCount(t))
    val regex = TextOps.tokenBudgetByThreshold(docs, "text", "source", "doc_id",
      budget = 4000L)
    // the same budget buys FEWER docs in BPE units (BPE >= regex per doc)
    val keptB = bpe.filter(col("kept")).count()
    val keptR = regex.filter(col("kept")).count()
    assert(keptB <= keptR, s"BPE-unit budget kept $keptB > regex-unit $keptR")
    assert(keptB > 0, "the budget is spendable in BPE units")
    // per-doc counts in the output ARE the BPE counts
    val one = bpe.limit(1).collect()(0)
    val doc = docs.filter(col("doc_id") === one.getAs[Long]("doc_id"))
      .select(TextOps.bpeTokenCount(col("text"))).head().getLong(0)
    assert(one.getAs[Long]("n_tok") === doc)
  }

  test("bpeTokenCount: hand-computed merges; t22 drift audit is sane per source") {
    import spark.implicits._
    // DefaultMerges walk: "the" -> [t,h,e] -(t,h)-> [th,e] -(th,e)->
    // [the] = 1; "that" -> [th,a,t] -(a,t)-> [th,at] = 2; "in" -(i,n)->
    // [in] = 1; "zzz" has no merging pair = 3. Regex count 4, BPE 7.
    val got = Seq("the that in zzz").toDF("text")
      .select(TextOps.bpeTokenCount(col("text")).as("n")).head().getLong(0)
    assert(got === 7L, "hand-computed BPE count")
    // per-word greedy left-to-right on a repeated pair: "aaa" with no
    // (a,a) rule stays 3; with a custom (a,a) rule: [aa, a] = 2
    val rep = Seq("aaa").toDF("text")
      .select(TextOps.bpeTokenCount(col("text"), Seq("a" -> "a")).as("n")).head().getLong(0)
    assert(rep === 2L, "greedy pass merges the first pair, not the overlap")
    // the audit on real data: every source's BPE count is <= regex-char
    // bound and >= word count; correction factor consistent with ppm
    val rows = TextOps.t22(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rt, bt) = (r.getAs[Long]("regex_tokens"), r.getAs[Long]("bpe_tokens"))
      assert(bt >= rt, "a word is at least one BPE token")
      assert(r.getAs[Long]("drift_ppm") === (bt - rt) * 1000000L / rt)
      val f = r.getAs[Double]("bpe_per_regex")
      assert(f >= 1.0 && f < 20.0, s"correction factor $f out of plausible range")
    }
  }

  test("t22 oracle encoding: double-separator replace IS the greedy fold (randomized)") {
    // the t22Sql twin encodes the per-rule greedy fold as ONE
    // replace() over a double-separator symbol string; replace-all
    // with resume-after-replacement has the same semantics in Java and
    // DuckDB, so this randomized differential (string form vs direct
    // fold) proves the ENCODING engine-independently — single-S
    // encodings fail on same-symbol runs (b b b b), which the
    // generator produces often
    val S = "\uE000"
    def greedy(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    def viaReplace(syms: Seq[String], l: String, r: String): Seq[String] = {
      val txt = (S + S) + syms.mkString(S + S) + (S + S)
      val out = txt.replace(S + l + S + S + r + S, S + l + r + S)
      out.split(S + S, -1).toSeq.filter(_.nonEmpty)
    }
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "ab", "c", "bb")
    val rules = Seq("a" -> "b", "a" -> "a", "ab" -> "a", "b" -> "b", "c" -> "a", "bb" -> "b")
    (1 to 5000).foreach { _ =>
      val syms = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
      val (l, r) = rules(rnd.nextInt(rules.length))
      assert(viaReplace(syms, l, r) === greedy(syms, l, r),
        s"encoding diverged on $syms with rule ($l, $r)")
    }
    // and the corpus cannot contain the separator (the encoding's one
    // precondition)
    assert(Tables.documents(spark, sf).filter(col("text").contains(S)).count() === 0)
  }

  test("pair-rank BPE == sequential rule-scan: randomized differential at 2500 and 50k rules") {
    import org.apache.spark.unsafe.types.UTF8String
    // the execution path (countTokensRanked, table-size-independent)
    // must match the reference rule-scan loop symbol for symbol — on
    // random texts, adversarial overlap shapes, and the gate corpus
    val rnd = new scala.util.Random(4321)
    val letters = "theinorandsgulbcfmpw"
    val texts = (1 to 400).map { _ =>
      Seq.fill(1 + rnd.nextInt(8))(
        (1 to (1 + rnd.nextInt(12))).map(_ => letters(rnd.nextInt(letters.length))).mkString)
        .mkString(" ")
    } ++ Seq("", "a", "aa", "aaaa", "aaaaaaa", "abababab", "aabbaabb",
      "the the the", "abba abab baba", "zzzzzz qqq")
    for (n <- Seq(2500, 50000)) {
      val merges = operators.TextOps.syntheticMerges(n)
      assert(merges.length === n, s"syntheticMerges must reach $n rules")
      val lefts = merges.map(_._1).toArray
      val rights = merges.map(_._2).toArray
      val table = new plans.BpeTable(lefts, rights)
      texts.foreach { t =>
        val u = UTF8String.fromString(t)
        assert(plans.BpeApply.countTokensRanked(u, table) ===
          plans.BpeApply.countTokens(u, lefts, rights),
          s"ranked BPE diverged from sequential on '$t' at n=$n")
      }
    }
    // gate corpus through the registered expression: exact sequential
    // differential at 2500 rules (the sequential driver loop at 50k
    // would cost minutes — the 50k equivalence is pinned by the text
    // battery above), plus a 50k smoke: runs, and merging can only
    // shrink counts as the table grows
    val merges2500 = operators.TextOps.syntheticMerges(2500)
    val l25 = merges2500.map(_._1).toArray
    val r25 = merges2500.map(_._2).toArray
    val corpus = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val viaExpr = Tables.documents(spark, sf)
      .select(sum(operators.TextOps.bpeTokenCount(col("text"), merges2500)))
      .head().getLong(0)
    val viaSeq = corpus.map(t =>
      plans.BpeApply.countTokens(UTF8String.fromString(t), l25, r25)).sum
    assert(viaExpr === viaSeq,
      "registered expression at 2500 rules diverged from the sequential reference on the corpus")
    val via50k = Tables.documents(spark, sf)
      .select(sum(operators.TextOps.bpeTokenCount(col("text"),
        operators.TextOps.syntheticMerges(50000))))
      .head().getLong(0)
    assert(via50k <= viaExpr, "a larger merges table can only merge more")
  }

  test("pair-rank BPE == sequential on RANDOM well-formed merges tables (20 seeded tables)") {
    import org.apache.spark.unsafe.types.UTF8String
    // the equivalence claim is for any WELL-FORMED table (each rule's
    // symbols are base chars or creations of earlier rules) — not just
    // syntheticMerges' structured tiers. Build random tables by the
    // same process BPE training uses: repeatedly merge two existing
    // symbols and add the result to the pool.
    val letters = "abcdefgh"
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val pool = scala.collection.mutable.ArrayBuffer[String](letters.map(_.toString): _*)
      val rules = (1 to 200).map { _ =>
        val l = pool(rnd.nextInt(pool.length))
        val r = pool(rnd.nextInt(pool.length))
        pool += (l + r)
        (l, r)
      }.distinct
      val lefts = rules.map(_._1).toArray
      val rights = rules.map(_._2).toArray
      val table = new plans.BpeTable(lefts, rights)
      val texts = (1 to 60).map { _ =>
        Seq.fill(1 + rnd.nextInt(6))(
          (1 to (1 + rnd.nextInt(14))).map(_ => letters(rnd.nextInt(letters.length))).mkString)
          .mkString(" ")
      }
      texts.foreach { t =>
        val u = UTF8String.fromString(t)
        assert(plans.BpeApply.countTokensRanked(u, table) ===
          plans.BpeApply.countTokens(u, lefts, rights),
          s"seed=$seed diverged on '$t' (rules=${rules.take(20)}...)")
      }
    }
  }

  test("compiled BPE counter == composed HOF fold (randomized differential, 25 rules)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val letters = "theinorandsgul"
    val texts = (1 to 300).map { _ =>
      Seq.fill(1 + rnd.nextInt(8))(
        (1 to (1 + rnd.nextInt(9))).map(_ => letters(rnd.nextInt(letters.length))).mkString)
        .mkString(" ")
    } :+ "" :+ "a" :+ "the the the" :+ "aaaa bbbb"
    val df = texts.toDF("text")
    val got = df.select(
      TextOps.bpeTokenCount(col("text")).as("fast"),
      TextOps.bpeTokenCountComposed(col("text")).as("ref")).collect()
    got.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) === r.getLong(1), s"compiled BPE diverged on '$t'")
    }
    // and the real gate corpus agrees end-to-end
    val corpus = Tables.documents(spark, sf).select(
      sum(TextOps.bpeTokenCount(col("text"))).as("fast"),
      sum(TextOps.bpeTokenCountComposed(col("text"))).as("ref")).head()
    assert(corpus.getLong(0) === corpus.getLong(1))
  }

  test("compiled BPE counter takes a 2500-rule table and matches a plain-Scala mirror") {
    import spark.implicits._
    val merges = TextOps.syntheticMerges(2500)
    assert(merges.length === 2500)
    // sequential greedy mirror, written independently of BpeApply
    def mirror(text: String): Long = {
      text.split(" ", -1).map { w =>
        if (w.isEmpty) 0L
        else {
          var syms: Vector[String] = w.split("", -1).filter(_.nonEmpty).toVector
          merges.foreach { case (l, r) =>
            syms = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
              else acc :+ x
            }
          }
          syms.size.toLong
        }
      }.sum
    }
    val texts = Seq(
      "the theatre of operations and the band played on",
      "aaaa abab baba cccc",
      "", "x", "supercalifragilistic expialidocious",
      "in on at and the for ing")
    val got = texts.toDF("text")
      .select(TextOps.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === texts.map(mirror),
      "2500-rule compiled counter diverged from the sequential mirror")
    // whole-corpus smoke at full table size: runs, and merging can
    // only shrink symbol counts from the character bound
    val chk = Tables.documents(spark, sf).limit(100)
      .select(sum(TextOps.bpeTokenCount(col("text"), merges)).as("b"),
        sum(length(col("text"))).as("c")).head()
    assert(chk.getLong(0) <= chk.getLong(1))
  }
}
