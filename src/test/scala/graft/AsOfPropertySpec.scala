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
}
