package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

class IngestSpec extends SparkSuite {

  test("csv roundtrip with header + inference + column normalization") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", " O_OrderKey ")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = Ingest.normalizeColumns(Ingest.readCsv(spark, dir))
    assert(back.columns.contains("o_orderkey"))
    assert(back.count() === Tables.orders(spark, sf).count())
    assert(back.schema("o_totalprice").dataType.typeName === "double")
  }

  test("json roundtrip preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    Tables.customer(spark, sf).write.mode("overwrite").json(dir)
    assert(Ingest.readJson(spark, dir).count() === Tables.customer(spark, sf).count())
  }

  test("salted aggregation equals plain aggregation") {
    import graft.operators.Skew
    val ev = Tables.events(spark, sf)
    val salted = Skew.saltedAgg(ev, "event_type", "event_id", 8, Seq("value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = ev.groupBy("event_type").agg(count(lit(1)), sum("value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet === plain.keySet)
    assert(salted.forall { case (k, (n, s)) =>
      n == plain(k)._1 && math.abs(s - plain(k)._2) < 1e-6 })
  }

  test("salted join equals plain join") {
    import graft.operators.Skew
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    val users = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("u_events"))
    val salted = Skew.saltedJoin(ev, users, "user_id", 4)
    val plain = ev.join(users, "user_id")
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("u_events")).head.getLong(0) === plain.agg(sum("u_events")).head.getLong(0))
  }

  test("bucketed tables join without a shuffle") {
    import graft.sources.Ingest
    Ingest.writeBucketed(Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 4)
    Ingest.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(joined.count() === Tables.lineitem(spark, sf).count())
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("typed JSON parsing agrees with the regex extraction path") {
    import org.apache.spark.sql.types._
    val ev = Tables.events(spark, sf)
    val parsed = graft.sources.Ingest.parseJsonColumn(ev, "props",
      StructType(Seq(StructField("k", LongType))))
    val viaJson = parsed.agg(sum(col("props_parsed.k"))).head.getLong(0)
    val viaRegex = ev.agg(sum(
      regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))).head.getLong(0)
    assert(viaJson === viaRegex)
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Ingest.writeParquet(Tables.events(spark, sf), dir, Seq("event_type"))
    val pruned = Ingest.readParquet(spark, dir).filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    // partition filter, not a data filter: the scan reads only one dir
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
  }
}
