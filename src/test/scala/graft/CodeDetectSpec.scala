package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** t25 code-vs-prose routing: the two signals must gate TOGETHER —
  * neither a symbol-heavy prose row nor a keyword-mentioning sentence
  * may misroute — and the registered plant must separate with margin.
  */
class CodeDetectSpec extends SparkSuite {

  test("t25 registered plant: flags EXACTLY the planted quarter, prose signals are zero, margins wide") {
    val out = TextOps.t25(spark, sf).collect()
    out.foreach { r =>
      val planted = r.getLong(0) % 4 == 0
      assert(r.getAs[Boolean]("is_code") === planted,
        s"doc ${r.getLong(0)}: is_code != planted")
      if (!planted) {
        assert(r.getAs[Long]("n_sym") === 0L && r.getAs[Long]("n_kw") === 0L,
          s"doc ${r.getLong(0)}: prose text carries code signals")
      } else {
        // not a knife-edge: planted docs clear both bars with margin
        assert(r.getAs[Long]("sym_ppm") >= 30000L, s"doc ${r.getLong(0)} sym_ppm thin")
        assert(r.getAs[Long]("n_kw") >= 18L, s"doc ${r.getLong(0)} n_kw thin")
      }
    }
    // the ppm denominator is the SEEDED length — repeats vary 3..5, so
    // the signal is genuinely per-row, not a constant
    assert(out.filter(_.getAs[Boolean]("is_code"))
      .map(_.getAs[Long]("sym_ppm")).distinct.length > 1)
  }

  test("t25 adversarial rows: each signal alone must NOT flag; dense code must") {
    import spark.implicits._
    val rows = Seq(
      // symbol-dense table dump, zero keywords (n_kw bar fails)
      (1L, "a=1; b=2; c=3; d=(4); e={5}; f=<6>; " * 8),
      // keyword-rich prose, essentially no symbols (sym_ppm bar fails)
      (2L, "the class will return when you import the function " +
        "and the var or const may def change things " * 4),
      // genuine code: both bars clear
      (3L, " def load(x): return x + 1; import os; const y = {a: 1}; " +
        "function g() { var z = (y < 2); } " * 3),
      // short prose: nothing fires
      (4L, "plain sentence about data pipelines and tables"))
      .toDF("doc_id", "t")
    val sig = TextOps.codeSignals(rows, "t").collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_code")).toMap
    assert(sig(1L) === false, "symbol dump misrouted as code")
    assert(sig(2L) === false, "keyword prose misrouted as code")
    assert(sig(3L) === true, "real code not detected")
    assert(sig(4L) === false)
  }
}
