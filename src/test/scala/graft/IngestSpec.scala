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
