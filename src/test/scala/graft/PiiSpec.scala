package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** The extended PII scrub (t24): Luhn gating on published test
  * numbers, near-miss rejection (round-17 VERDICT directive 6's
  * done-bar), check-digit generation round-trip, and the full-scrub
  * mask classes on planted rows. */
class PiiSpec extends SparkSuite {
  import spark.implicits._

  private def luhnOf(cards: Seq[String]): Map[String, Boolean] =
    cards.toDF("c").select(col("c"), TextOps.luhnValid16(col("c")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

  test("Luhn accepts published test card numbers and rejects every near-miss") {
    // classic 16-digit test numbers from the public card-brand test
    // ranges (Visa/Mastercard/Discover docs) — all Luhn-valid
    val valid = Seq("4111111111111111", "4532015112830366",
      "5555555555554444", "6011111111111117")
    // near-misses: each valid number with ONE digit perturbed — every
    // single-digit change breaks the checksum (Luhn's design property)
    val nearMisses = valid.flatMap { c =>
      Seq(0, 7, 15).map { pos =>
        val d = c(pos) - '0'
        c.updated(pos, ('0' + (d + 1) % 10).toChar)
      }
    }
    val got = luhnOf(valid ++ nearMisses)
    valid.foreach(c => assert(got(c), s"valid test number $c rejected"))
    nearMisses.foreach(c => assert(!got(c), s"near-miss $c accepted"))
  }

  test("generated check digits round-trip through the validator (t24's planted generator)") {
    val rows = Seq(0L, 1L, 7L, 12345L, 99999999L).toDF("doc_id")
      .withColumn("b15", concat(lit("4"),
        lpad((col("doc_id") % 100000000L).cast("string"), 8, "0"), lit("123456")))
      .withColumn("chk", (lit(10) - TextOps.luhnSum15(col("b15")) % 10) % 10)
      .withColumn("card", concat(col("b15"), col("chk").cast("string")))
      .withColumn("near", concat(col("b15"), ((col("chk") + 1) % 10).cast("string")))
      .select(TextOps.luhnValid16(col("card")).as("cardOk"),
        TextOps.luhnValid16(col("near")).as("nearOk"))
      .collect()
    rows.foreach { r =>
      assert(r.getBoolean(0), "generated check digit failed its own validator")
      assert(!r.getBoolean(1), "the +1 near-miss passed Luhn")
    }
  }

  test("redactPiiFull masks email/phone/IP/valid-card and LEAVES the Luhn-invalid run") {
    val in = Seq(
      "mail a@b.org call 555-123-0042 from 192.168.001.250 " +
        "pay 4111111111111111 order 4111111111111112").toDF("t")
    val out = TextOps.redactPiiFull(in, "t").head().getString(0)
    assert(out === "mail [EMAIL] call [PHONE] from [IP] " +
      "pay [CARD] order 4111111111111112", out)
  }

  test("a clean row passes through the full scrub unchanged") {
    val in = Seq("nothing sensitive here, order 123 at 4pm v1.2").toDF("t")
    assert(TextOps.redactPiiFull(in, "t").head().getString(0) ===
      "nothing sensitive here, order 123 at 4pm v1.2")
  }
}
