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
      "language" -> 8L,        // -8 (Spanish markers)
      "exact_dedup" -> 7L,     // -9 (byte-identical to doc 1)
      "near_dedup" -> 6L,      // -10 (1-token edit of doc 2, Jaccard ≈ 0.95)
      "decontaminated" -> 5L,  // -11 (contains an eval 5-gram)
      "sampled" -> 5L))        // no cap configured
    assert(r.kept.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L, 4L, 5L))
    // audit trail: the near-dup victim fails exactly at its stage
    val row10 = r.flagged.filter(col("doc_id") === 10L).head()
    assert(row10.getAs[Boolean]("f_exact") && !row10.getAs[Boolean]("f_neardup"))
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
}
