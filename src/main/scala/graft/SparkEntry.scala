package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every operator family contributes a `queries` map (name → builder)
  * and an `oracles` map (name → DuckDB-equivalent ANSI SQL). Keys
  * without an oracle get the driver's weaker rows-only check (marked
  * rows-only in SURVEY.md §2).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Cleaning.queries ++ MLPrep.queries ++
      TextOps.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ graft.streaming.Streams.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Cleaning.oracles ++ MLPrep.oracles ++
      TextOps.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ graft.streaming.Streams.oracles
}
