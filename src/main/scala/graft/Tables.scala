package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema + pipeline
  * tables (see TESTDATA.md). One parquet file per table under the
  * scale-factor directory passed to each query.
  *
  * At cluster scale these would be catalog tables (possibly bucketed);
  * here they are plain parquet reads — Catalyst still gets pushdown and
  * column pruning through the DataSource V2 parquet scan.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/lineitem.parquet")
  /** events.ts has shipped in two parquet flavors across testdata
    * generations: TIMESTAMP(NANOS) (no native Spark type — read nanos
    * as long via the legacy conf and truncate to micros) and plain
    * timestamp[us] (reads as TIMESTAMP_NTZ — cast to session-local
    * TimestampType). Branch on the observed physical type so either
    * flavor normalizes to the same TimestampType column. Sub-
    * microsecond precision is dropped in the nanos flavor; all oracle-
    * compared orderings therefore use (epoch_ms, event_id), never raw
    * ts (SURVEY.md §6.4).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ts =
      if (raw.schema("ts").dataType == LongType) timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
