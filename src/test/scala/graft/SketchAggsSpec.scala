package graft

import org.apache.spark.sql.functions._
import graft.plans.SketchAggs

/** Unit properties of the engine-primitive sketch aggregates
  * (plans/SketchAggs) — merge/idempotence/bound invariants the
  * q44/q46/st20 oracle gates then exercise end to end. */
class SketchAggsSpec extends SparkSuite {

  test("kmv sketch: bottom-k by (h,id), deduped, sorted; partial merge == one-shot") {
    import spark.implicits._
    val k = 8
    // 100 pairs with duplicate ids and colliding h values
    val rows = (1L to 50L).flatMap(i => Seq((i % 7, i), (i % 7, i))) // exact dups
    val df = rows.toDF("h", "id")
    val sk = df.agg(SketchAggs.kmvSketch(col("h"), col("id"), k).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.h"), col("e.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = rows.distinct.sorted.take(k)
    assert(sk.toSeq === want, "sketch must be the k smallest distinct (h,id) pairs in order")
    // slicing invariance: aggregate two halves, explode, re-aggregate
    val (a, b) = rows.splitAt(30)
    def skOf(xs: Seq[(Long, Long)]) = xs.toDF("h", "id")
      .agg(SketchAggs.kmvSketch(col("h"), col("id"), k).as("sk"))
    val merged = skOf(a).unionByName(skOf(b))
      .select(explode(col("sk")).as("e"))
      .agg(SketchAggs.kmvSketch(col("e.h"), col("e.id"), k).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.h"), col("e.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(merged.toSeq === want, "summary union must equal the one-shot sketch")
  }

  test("kmv sketch is usable from SQL via GraftExtensions") {
    import spark.implicits._
    Seq((5L, 1L), (3L, 2L), (9L, 3L)).toDF("h", "id").createOrReplaceTempView("kmv_in")
    val got = spark.sql(
      "SELECT size(graft_kmv_sketch(h, id, 2)) AS n, graft_kmv_sketch(h, id, 2)[0].h AS h0 FROM kmv_in")
      .collect().head
    assert(got.getInt(0) === 2 && got.getLong(1) === 3L)
  }

  test("cm sketch: cells equal hand-built matrix; merge is elementwise; estimates one-sided") {
    import spark.implicits._
    val (d, w) = (3, 64)
    val P = graft.functions.TextFunctions.P
    import graft.functions.TextFunctions.{permA, permB}
    val keys = (1L to 200L).map(i => i % 23) // heavy collisions in 64 cells
    val got = keys.toDF("k")
      .agg(SketchAggs.cmSketch(col("k"), lit(1L), d, w).as("cm"))
      .collect().head.getSeq[Long](0)
    val want = new Array[Long](d * w)
    keys.foreach { key =>
      (0 until d).foreach { j =>
        val pos = Math.floorMod(Math.floorMod(key, P) * permA(j) + permB(j), P) % w
        want(j * w + pos.toInt) += 1L
      }
    }
    assert(got.toArray.toSeq === want.toSeq)
    // every key's min-cell estimate is >= its true count (one-sided)
    val exact = keys.groupBy(identity).map { case (key, xs) => key -> xs.size.toLong }
    exact.foreach { case (key, n) =>
      val est = (0 until d).map { j =>
        val pos = Math.floorMod(Math.floorMod(key, P) * permA(j) + permB(j), P) % w
        got(j * w + pos.toInt)
      }.min
      assert(est >= n, s"CM underestimated key $key")
    }
    // cmPositions matches the buffer-side hash
    val posDf = Seq(7L).toDF("k")
      .select(SketchAggs.cmPositions(col("k"), d, w).zipWithIndex
        .map { case (c, i) => c.as(s"p$i") }: _*).collect().head
    (0 until d).foreach { j =>
      val pos = Math.floorMod(Math.floorMod(7L, P) * permA(j) + permB(j), P) % w
      assert(posDf.getLong(j) === j * w + pos)
    }
  }

  test("binned counts: hand-built array, null-skip, weight merge, loud out-of-range") {
    import spark.implicits._
    val b = 8
    val rows = Seq(Some(0L), Some(3L), Some(3L), None, Some(7L))
    val got = rows.toDF("bin")
      .agg(SketchAggs.binnedCounts(col("bin"), lit(1L), b)).collect().head.getSeq[Long](0)
    assert(got.toSeq === Seq(1L, 0L, 0L, 2L, 0L, 0L, 0L, 1L))
    // weighted re-aggregation (the histogramMerge pattern) is exact addition
    val merged = Seq((0L, 5L), (3L, 2L), (3L, 2L), (7L, 1L)).toDF("bin", "c")
      .agg(SketchAggs.binnedCounts(col("bin"), col("c"), b)).collect().head.getSeq[Long](0)
    assert(merged.toSeq === Seq(5L, 0L, 0L, 4L, 0L, 0L, 0L, 1L))
    // out-of-range bins fail loudly instead of corrupting a neighbor
    val ex = intercept[Exception] {
      Seq(9L).toDF("bin").agg(SketchAggs.binnedCounts(col("bin"), lit(1L), b)).collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("graft_binned_counts")), s"wanted the bin guard, got $ex")
  }
}
