package graft

import org.apache.spark.sql.functions._
import graft.functions.Quantiles
import graft.operators.{MLPrep, Relational}

/** The quantile-mode contract (functions.Quantiles): the DEFAULT is
  * the fixed-memory percentile_approx sketch (the 100 TB path for
  * unbounded-domain columns); `exact = true` is the bounded-domain /
  * oracle opt-in. These tests pin (1) which physical aggregate each
  * mode plans, and (2) the sketch's rank-accuracy bound against the
  * exact baseline, so flipping a default back to exact — the q18/m17
  * scale-killer class — fails loudly.
  */
class PercentileSpec extends SparkSuite {

  test("default mode plans the sketch; exact mode plans the value-map aggregate") {
    val o = Tables.orders(spark, sf)
    val sketch = o.agg(Quantiles.quantile(col("o_totalprice"), 0.5))
      .queryExecution.optimizedPlan.toString
    assert(sketch.contains("percentile_approx") && !sketch.contains("percentile(o_totalprice"),
      s"default must be the sketch:\n$sketch")
    val exact = o.agg(Quantiles.quantile(col("o_totalprice"), 0.5, exact = true))
      .queryExecution.optimizedPlan.toString
    assert(exact.contains("percentile(o_totalprice") && !exact.contains("percentile_approx"),
      s"exact opt-in must be the value-map form:\n$exact")
  }

  test("inventory q18/m17 default paths are sketch-planned; the registered entries are the exact oracle mode") {
    val liDefault = Relational.groupQuantiles(Tables.lineitem(spark, sf))
      .queryExecution.optimizedPlan.toString
    assert(liDefault.contains("percentile_approx"), liDefault)
    val binDefault = MLPrep.quantileBin(
      Tables.orders(spark, sf).select(col("o_totalprice")), "o_totalprice", 4)
      .queryExecution.optimizedPlan.toString
    assert(binDefault.contains("percentile_approx"), binDefault)
    // the oracle entries stay exact (hash-parity with DuckDB quantile_cont)
    assert(!Relational.q18(spark, sf).queryExecution.optimizedPlan.toString
      .contains("percentile_approx"))
    assert(!MLPrep.m17(spark, sf).queryExecution.optimizedPlan.toString
      .contains("percentile_approx"))
  }

  test("sketch stays within its rank-error bound of exact on an unbounded domain") {
    // rank guarantee: |rank(approx) - rank(exact)| <= n/accuracy.
    // Verify in RANK space (the actual contract), not value space.
    val vals = Tables.lineitem(spark, sf).select(col("l_extendedprice"))
      .collect().map(_.getDouble(0)).sorted
    val n = vals.length
    for (p <- Seq(0.25, 0.5, 0.75)) {
      val approx = Tables.lineitem(spark, sf)
        .agg(Quantiles.quantile(col("l_extendedprice"), p).as("a"))
        .head().getDouble(0)
      val rank = vals.count(_ <= approx)
      val tol = math.max(1.0, n.toDouble / Quantiles.DefaultAccuracy) + 1
      assert(math.abs(rank - p * n) <= tol,
        s"p=$p: rank($approx)=$rank vs target ${p * n} (n=$n, tol=$tol)")
    }
  }

  test("default-mode quantileBin lands each bin within rank tolerance of n/k") {
    val o = Tables.orders(spark, sf).select(col("o_totalprice"))
    val n = o.count()
    val bins = MLPrep.quantileBin(o, "o_totalprice", 4).collect()
    assert(bins.map(_.getAs[Int]("bin")).toSeq == Seq(1, 2, 3, 4))
    // ties at 2-decimal prices can move a few rows across a boundary;
    // the sketch adds n/accuracy. Both are far under 5% of n/k here.
    val target = n / 4.0
    bins.foreach { r =>
      val cnt = r.getAs[Long]("n")
      assert(math.abs(cnt - target) <= target * 0.05 + n / Quantiles.DefaultAccuracy + 1,
        s"bin ${r.getAs[Int]("bin")}: $cnt vs $target")
    }
    // bins tile the value range: lo/hi are ordered and non-overlapping
    val ordered = bins.sortBy(_.getAs[Int]("bin"))
    ordered.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9)
    }
  }
}
