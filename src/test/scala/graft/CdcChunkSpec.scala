package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Content-defined chunking (mm11 / CdcBoundariesExpr): the rolling
  * expression matches a plain-Scala direct-sum reference, boundaries
  * are SHIFT-INVARIANT beyond one window of an edit, chunks reassemble
  * to the text, and the planted 1-byte-shifted duplicate that mm10's
  * fixed grid misses (dup bytes ≈ 0) is caught by CDC (dup bytes near
  * the planted fraction) — round-17 VERDICT directive 2's done-bar. */
class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  /** Direct-sum reference: H(i) computed independently per position —
    * never the rolling recurrence the expression uses (congruence of
    * the two IS the thing under test; this is also exactly what the
    * DuckDB twin evaluates). */
  private def refBoundaries(text: String): Seq[Int] = {
    val w = Multimodal.CdcWindow
    val b = text.getBytes("UTF-8").map(_ & 0xff)
    (w to b.length).filter { i =>
      val h = (0 until w).foldLeft(0L) { (acc, k) =>
        (acc * Multimodal.CdcBase + b(i - w + k)) % Multimodal.CdcMod
      }
      h % Multimodal.CdcDivisor == 0
    }
  }

  private def sparkBoundaries(texts: Seq[String]): Map[String, Seq[Int]] =
    texts.toDF("t")
      .select(col("t"), Multimodal.cdcBoundaries(col("t")).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSeq).toMap

  private val rnd = new scala.util.Random(18)
  private def randText(n: Int): String =
    (1 to n).map(_ => "abcdefghijklmnopqrstuvwxyz      "(rnd.nextInt(32))).mkString

  test("rolling expression == direct-sum reference (the oracle's form) on random and edge inputs") {
    val texts = Seq("", "a", "abcdefg", "abcdefgh", "hhhhhhhhhhhhhhhhhhhh") ++
      (1 to 30).map(_ => randText(50 + rnd.nextInt(500)))
    val got = sparkBoundaries(texts)
    texts.foreach { t =>
      assert(got(t) === refBoundaries(t), s"mismatch on ${t.take(40)}...")
    }
    // non-degenerate: the random texts must actually produce boundaries
    assert(texts.map(got(_).size).sum > 20, "divisor/window produce ~no boundaries")
  }

  test("boundaries are shift-invariant beyond one window of an edit") {
    val p = randText(800)
    val q = "X" + p // 1-byte front insertion — the prefix-shifted re-encode
    val bs = sparkBoundaries(Seq(p, q))
    val w = Multimodal.CdcWindow
    // every boundary of p past the first window reappears in q shifted
    // by exactly the insertion length (and vice versa)
    val pAfter = bs(p).filter(_ > w).map(_ + 1).toSet
    val qAfter = bs(q).filter(_ > w + 1).toSet
    assert(pAfter === qAfter,
      s"boundaries did not shift with content: ${pAfter.size} vs ${qAfter.size}")
  }

  test("chunks reassemble to the text; no empty chunks; expected length ~ divisor") {
    val texts = (1 to 10).map(_ => randText(300 + rnd.nextInt(300)))
    val rows = texts.toDF("t")
      .select(col("t"), Multimodal.cdcChunks(col("t")).as("c"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0); val cs = r.getSeq[String](1)
      assert(cs.mkString === t, "chunks do not reassemble")
      assert(cs.forall(_.nonEmpty))
    }
    val all = rows.flatMap(_.getSeq[String](1))
    val mean = all.map(_.length).sum.toDouble / all.length
    assert(mean > Multimodal.CdcDivisor / 4.0 && mean < Multimodal.CdcDivisor * 4.0,
      s"mean chunk length $mean far from the ${Multimodal.CdcDivisor}-byte target")
  }

  test("planted 1-byte-shifted duplicate: fixed grid reclaims ~nothing, CDC reclaims the shared suffix") {
    val p = randText(1000)
    val docs = Seq(p, "X" + p).toDF("text")
    // mm10's fixed 32-byte grid over the same pair
    val grid = docs.select(explode(expr(
        "transform(sequence(0, int(ceil(length(text) / 32.0)) - 1), " +
          "i -> substring(text, i * 32 + 1, 32))")).as("chunk"))
      .groupBy(col("chunk")).agg(count(lit(1)).as("copies"))
      .agg(sum(when(col("copies") > 1, (col("copies") - 1) * length(col("chunk")))
        .otherwise(0L)).as("dup_bytes"))
      .head().getLong(0)
    val cdc = docs.select(explode(Multimodal.cdcChunks(col("text"))).as("chunk"))
      .groupBy(col("chunk")).agg(count(lit(1)).as("copies"))
      .agg(sum(when(col("copies") > 1, (col("copies") - 1) * length(col("chunk")))
        .otherwise(0L)).as("dup_bytes"))
      .head().getLong(0)
    // grid: every boundary shifted -> at most stray coincidental chunks
    assert(grid < 100, s"grid unexpectedly reclaimed $grid bytes")
    // CDC: everything past the first re-synchronized boundary dedups —
    // expect well over half the payload reclaimed
    assert(cdc > 500, s"CDC reclaimed only $cdc of 1000 shared bytes")
  }
}
