package graft

import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSuite {

  // one purpose-built victim per stage; good docs are long, distinct,
  // low-punctuation English so they pass every gate
  private def goodText(i: Int): String =
    (1 to 20).map(j => s"the w${i}a$j w${i}b$j w${i}c$j").mkString(" ")

  private def fixture = {
    import spark.implicits._
    val good = (1 to 5).map(i => (i.toLong, goodText(i), s"src${i % 2}"))
    val short = Seq((6L, "tiny text", "src0"))                      // < 5 tokens
    val lowq = Seq((7L, "z1 z2 z3 z4 z5 z6", "src0"))               // 17 chars → quality ≈ 0.03
    val es = Seq((8L, (1 to 20).map(j => s"el w8a$j w8b$j w8c$j").mkString(" "), "src1"))
    val dup = Seq((9L, goodText(1), "src1"))                        // exact copy of doc 1
    val near = Seq((10L, goodText(2).replace("w2c20", "CHANGED"), "src0")) // 1 token off doc 2
    val contam = Seq((11L,
      goodText(3).replace("w3a10", "alpha beta gamma delta epsilon"), "src1"))
    (good ++ short ++ lowq ++ es ++ dup ++ near ++ contam)
      .toDF("doc_id", "text", "source")
  }

  test("curate: every stage drops exactly its designed victim") {
    import spark.implicits._
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val r = Corpus.curate(fixture,
      cfg = Corpus.Config(nearDupTau = 0.9, evalSet = Some(evalSet)))
    val rep = r.report.collect()
      .map(row => row.getAs[String]("stage") -> row.getAs[Long]("surviving")).toMap
    assert(rep === Map(
      "input" -> 11L,          // all rows
      "min_tokens" -> 10L,     // -6 (2 tokens)
      "quality" -> 9L,         // -7 (too short to saturate)
      "repetition" -> 9L,      // gate off → pass-through
      "language" -> 8L,        // -8 (Spanish markers)
      "lm_quality" -> 8L,      // gate off → pass-through
      "exact_dedup" -> 7L,     // -9 (byte-identical to doc 1)
      "near_dedup" -> 6L,      // -10 (1-token edit of doc 2, Jaccard ≈ 0.95)
      "decontaminated" -> 5L,  // -11 (contains an eval 5-gram)
      "sampled" -> 5L,         // no cap configured
      "token_budget" -> 5L))   // no budget configured
    assert(r.kept.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L, 4L, 5L))
    // audit trail: the near-dup victim fails exactly at its stage
    val row10 = r.flagged.filter(col("doc_id") === 10L).head()
    assert(row10.getAs[Boolean]("f_exact") && !row10.getAs[Boolean]("f_neardup"))
  }

  test("curate: repetition and LM gates drop exactly their designed victims") {
    import spark.implicits._
    val commonText = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = (
      (1 to 10).map(i => (i.toLong, commonText, "src0")) ++ Seq(
        // 20: 'spam' is 50% of tokens (> 0.4) but trigrams are distinct
        (20L, (1 to 20).map(i => s"spam w$i").mkString(" "), "src0"),
        // 21: top token 1/3 (≤ 0.4) but 93% duplicate trigrams (> 0.5)
        (21L, (1 to 15).flatMap(_ => Seq("p1", "p2", "p3")).mkString(" "), "src0"),
        // 22: all-unique tokens → avg log10 unigram prob ≈ -2.63 (< -2.0)
        (22L, (1 to 30).map(i => s"u$i").mkString(" "), "src0")))
      .toDF("doc_id", "text", "source")
    val r = Corpus.curate(docs, cfg = Corpus.Config(
      lang = None, maxTopTokFrac = Some(0.4), maxDupTrigramFrac = Some(0.5),
      minAvgLogProb = Some(-2.0)))
    val flags = r.flagged.collect().map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(flags(20L).getAs[Boolean]("f_quality") && !flags(20L).getAs[Boolean]("f_repetition"),
      "top-token gate drops the spam doc")
    assert(flags(21L).getAs[Boolean]("f_quality") && !flags(21L).getAs[Boolean]("f_repetition"),
      "dup-trigram gate drops the looping doc")
    assert(flags(22L).getAs[Boolean]("f_lang") && !flags(22L).getAs[Boolean]("f_lm"),
      "LM gate drops the rare-token doc")
    // the ten identical common docs pass every gate, exact dedup keeps min id
    assert(r.kept.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("curate: per-source cap downsamples each source toward the target") {
    import spark.implicits._
    // 400 distinct good docs across 2 sources, no other gates trip
    val docs = (1 to 400).map(i => (i.toLong, goodText(i), s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.curate(docs, cfg = Corpus.Config(samplePerSource = Some(50L)))
    val by = r.kept.groupBy(col("source")).count().collect()
      .map(row => row.getAs[String]("source") -> row.getAs[Long]("count")).toMap
    assert(by.keySet === Set("src0", "src1"))
    // hash thresholding: expected 50 of 200 per source, ±binomial
    by.values.foreach(c => assert(c > 25 && c < 75, s"source count $c vs target 50"))
    val rep = r.report.collect()
      .map(row => row.getAs[String]("stage") -> row.getAs[Long]("surviving")).toMap
    assert(rep("decontaminated") === 400L)
    assert(rep("sampled") === by.values.sum)
  }

  test("curate: token budget keeps the best tokens per source, never undershooting") {
    import spark.implicits._
    // 40 good docs, 2 sources; every doc ~80 tokens; budget 400 tokens
    // per source → ~5 docs per source survive, chosen by quality rank
    val docs = (1 to 40).map(i => (i.toLong, goodText(i), s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val budget = 400L
    val r = Corpus.curate(docs,
      cfg = Corpus.Config(tokenBudgetPerSource = Some(budget)))
    val kept = r.kept
      .withColumn("__tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("__q", round(graft.functions.TextFunctions.qualityScore(col("text")), 6))
      .collect()
      .map(row => (row.getAs[String]("source"), row.getAs[Long]("doc_id"),
        row.getAs[Long]("__tok"), row.getAs[Double]("__q")))
    assert(kept.nonEmpty)
    kept.groupBy(_._1).foreach { case (src, rows) =>
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(total >= budget || rows.size == 20,
        s"$src undershoots: kept $total of $budget with docs left")
      assert(total < budget + maxDoc, s"$src overshoots by more than the boundary doc")
    }
    // the kept set is a quality prefix: no dropped doc outranks a kept one
    val flags = r.flagged
      .withColumn("__q", round(graft.functions.TextFunctions.qualityScore(col("text")), 6))
      .select(col("source"), col("doc_id"), col("__q"), col("f_sampled"), col("f_budget"))
      .collect()
      .map(row => (row.getAs[String]("source"), row.getAs[Long]("doc_id"),
        row.getAs[Double]("__q"), row.getAs[Boolean]("f_sampled"), row.getAs[Boolean]("f_budget")))
    flags.groupBy(_._1).foreach { case (src, rows) =>
      // walk priority is (quality DESC, id ASC) ⇔ tuple (q, -id) DESC:
      // every kept row must outrank every dropped-by-budget row
      val keptP = rows.filter(_._5).map(r => (r._3, -r._2))
      val dropP = rows.filter(r => r._4 && !r._5).map(r => (r._3, -r._2))
      if (keptP.nonEmpty && dropP.nonEmpty)
        assert(Ordering[(Double, Long)].gteq(keptP.min, dropP.max),
          s"$src kept set is not a quality prefix")
    }
    val rep = r.report.collect()
      .map(row => row.getAs[String]("stage") -> row.getAs[Long]("surviving")).toMap
    assert(rep("token_budget") === kept.length.toLong)
    assert(rep("token_budget") < rep("sampled"), "budget must actually drop something here")
  }
}
