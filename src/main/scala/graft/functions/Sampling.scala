package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic keep/drop hash shared by the samplers (m15
  * stratified sampling, m16 domain mixing): a Knuth multiplicative
  * hash into 2^20 buckets, compared against a per-group integer
  * threshold. One definition, one SQL twin — the constants used to be
  * restated at every call site (two operators + two oracle strings),
  * where a fix would have to land five times or the engines silently
  * diverge.
  *
  * The key is pre-reduced mod 2^31 BEFORE the multiply: 2^31·HashA ≈
  * 5.7e18 fits a signed 64-bit integer in BOTH engines, whereas the
  * raw product overflows past key ≈ 3.47e9 — where Spark's non-ANSI
  * multiply wraps silently but DuckDB raises, aborting the oracle
  * compare exactly in the 100 TB regime (TPC-H orderkeys cross 2^31
  * around SF 1000) these samplers are designed for. Keys below 2^31
  * hash identically to the unmasked form.
  */
object Sampling {
  val HashA = 2654435761L // Knuth's 2^32/φ
  val HashB = 40503L
  val Buckets = 1048576L  // 2^20
  val KeyMask = 2147483648L // 2^31

  /** Bucket in [0, 2^20) from a non-negative integer key column. */
  def bucket(key: Column): Column =
    pmod(pmod(key, lit(KeyMask)) * HashA + HashB, lit(Buckets))

  /** DuckDB twin of [[bucket]] (keys are non-negative, so `%` = pmod). */
  def bucketSql(key: String): String =
    s"(($key % $KeyMask) * $HashA + $HashB) % $Buckets"

  /** Deterministic TRAINING-sample cap (round 15): the iteratively-
    * trained operators (m7's RF, m14's CV grid, t20's LBFGS seed)
    * measured ~linear training wall in corpus size (m7: ×10 4.7 s →
    * ×100 49.5 s, exponent 1.02) — at 100 TB an uncapped training
    * pass IS the job. Statistically, importances/AUC/classifier
    * weights converge long before 10^6 rows; past the cap the sample
    * is a fixed-size deterministic hash-slice (same keep/drop hash as
    * the samplers, so reruns and engines agree), and below it the
    * frame passes through untouched — the oracle-gate SFs (≤ sf0.1)
    * sit far under every cap, so gated outputs are byte-identical.
    * The count() is one cheap narrow-column pass, paid only by the
    * training path. */
  def capTrainingSample(df: org.apache.spark.sql.DataFrame, cap: Long,
      key: Column*): org.apache.spark.sql.DataFrame = {
    val n = df.count()
    if (n <= cap) df
    else df.filter(bucket(xxhash64(key: _*)) < Buckets * cap / n)
  }
}
