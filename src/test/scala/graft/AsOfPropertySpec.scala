package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property test for the custom as-of operator: on seeded random
  * datasets (duplicate keys, duplicate timestamps, keys with no
  * matches, empty sides), AsOfJoinExec must agree with an independent
  * window-based reference implementation. */
class AsOfPropertySpec extends SparkSuite {

  private def referenceAsOf(left: DataFrame, right: DataFrame): Set[(Long, Long, Option[Long])] = {
    // union + last(ignoreNulls) over (key, time, side) — the q14 shape
    val l = left.select(col("k"), col("t"), col("lid"), lit(null).cast("long").as("rt"), lit(1).as("side"))
    val r = right.select(col("k"), col("t"), lit(null).cast("long").as("lid"), col("t").as("rt"), lit(0).as("side"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("side"), col("lid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m", last(col("rt"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("k"),
        if (x.isNullAt(x.fieldIndex("m"))) None else Some(x.getAs[Long]("m")))).toSet
  }

  test("custom as-of equals the window reference on 10 seeded random datasets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(8)
      val lRows = (1 to 50 + rnd.nextInt(100)).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, i.toLong) }
      val rRows = (1 to rnd.nextInt(120)).map { i =>
        (rnd.nextInt(nKeys + 2).toLong, rnd.nextInt(40).toLong, (1000 + i).toLong) }
      val left = lRows.toDF("k", "t", "lid")
      val right = rRows.toDF("rk", "rt_", "rid")
      val got = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt_")
        .select(col("lid"), col("k"), col("rt_"))
        .collect().map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getLong(2)))).toSet
      val want = referenceAsOf(left,
        right.select(col("rk").as("k"), col("rt_").as("t")))
      assert(got === want, s"trial $trial mismatch")
    }
  }

  test("null keys/times never match (SQL/DuckDB ASOF semantics)") {
    import spark.implicits._
    // left: null key, null time, and a live row; right: null key/time
    // rows that would 'sort before everything' plus one real match
    val left = Seq(
      (Option.empty[Long], Option(10L), 1L),
      (Option(1L), Option.empty[Long], 2L),
      (Option(1L), Option(10L), 3L)
    ).toDF("k", "t", "lid")
    val right = Seq(
      (Option.empty[Long], Option(5L), 100L), // null key: skipped
      (Option(1L), Option.empty[Long], 101L), // null time: skipped
      (Option(1L), Option(5L), 102L)          // real match for lid=3
    ).toDF("rk", "rt_", "rid")
    val got = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt_")
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got === Map(1L -> None, 2L -> None, 3L -> Some(102L)))
  }

  test("custom as-of handles string keys via the generic merge path") {
    import spark.implicits._
    val left = Seq(("a", 10L, 1L), ("b", 10L, 2L), ("c", 10L, 3L)).toDF("k", "t", "lid")
    val right = Seq(("a", 5L, 100L), ("a", 7L, 101L), ("b", 11L, 102L)).toDF("rk", "rt_", "rid")
    val got = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt_")
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got === Map(1L -> Some(101L), 2L -> None, 3L -> None))
  }

  test("as-of join fails at call time with a clear message on mismatched key/time types") {
    import spark.implicits._
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val rightIntKey = Seq((1, 5L, 100L)).toDF("rk", "rt_", "rid")
    val exKey = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(left, rightIntKey, "k", "rk", "t", "rt_")
    }
    assert(exKey.getMessage.contains("key types must match"))
    assert(exKey.getMessage.contains("bigint") && exKey.getMessage.contains("int"))
    val rightDoubleTime = Seq((1L, 5.0, 100L)).toDF("rk", "rt_", "rid")
    val exTime = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(left, rightDoubleTime, "k", "rk", "t", "rt_")
    }
    assert(exTime.getMessage.contains("time types must match"))
    // an explicit cast fixes it — the documented remedy works
    val fixed = graft.plans.AsOf.join(left,
      rightIntKey.withColumn("rk", col("rk").cast("long")), "k", "rk", "t", "rt_")
      .select(col("lid"), col("rid")).collect()
    assert(fixed.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 100L)))
  }
}
