package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY.md §5). AQE's skew-join split
  * covers sort-merge joins at runtime; these cover the cases AQE
  * can't: skewed AGGREGATION keys and broadcast-infeasible skewed
  * joins. Pattern: scatter hot keys across `nSalts` sub-keys, do the
  * heavy work per sub-key, then merge — two small shuffles instead of
  * one shuffle with a straggler partition.
  */
object Skew {

  /** Two-phase (salted) aggregation: counts and sums grouped by `key`,
    * computed as groupBy(key, salt) → groupBy(key). The salt is
    * derived from a unique column so it's deterministic and spreads
    * each hot key over `nSalts` reducers. */
  def saltedAgg(df: DataFrame, key: String, uniqueCol: String, nSalts: Int,
      sumCols: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(nSalts.toLong)))
    val stage1 = salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    stage1.groupBy(col(key))
      .agg(sum(col("__cnt")).as("n"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Salted join of a skewed `big` side against a non-broadcastable
    * `small` side: big rows scatter over (key, salt); small rows
    * replicate to every salt. Output equals big ⋈ small on `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
