package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` columns (SURVEY.md
  * §2.E/F). Built from `zip_with`/`aggregate` so they run inside
  * codegen with zero object allocation per element (vs a Scala UDF
  * boxing every float).
  *
  * Determinism: elements are cast to double BEFORE multiplying, and the
  * fold runs in ascending index order — the DuckDB twins below use the
  * same cast-then-multiply and a list_sum in the same order, so dot
  * products are bit-identical across engines.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance — cast-then-subtract per element, ascending
    * fold (same determinism contract as [[dot]]); the PQ primitives
    * (s11) score subvectors with it. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Prefer the fused codegen'd expression (graft.plans.
    * CosineSimilarityExpr — single loop, zero allocation) when the
    * session has GraftExtensions installed; fall back to the builtin
    * fold otherwise. Both compute the identical double sequence. */
  def cosineAuto(s: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (s.catalog.functionExists("graft_cosine")) call_function("graft_cosine", a, b)
    else cosine(a, b)

  // ---------------- DuckDB SQL twins ----------------

  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)))"

  def normSqSql(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${normSqSql(a)}) * sqrt(${normSqSql(b)})))"

  def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> " +
      s"(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE)) * " +
      s"(CAST(($a)[i] AS DOUBLE) - CAST(($b)[i] AS DOUBLE))))"
}
