package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** SQL-surface parity: the functions GraftExtensions registers must
  * produce bit-identical results to their Scala Column twins (they ARE
  * the same composition, expanded at analysis). */
class SqlFunctionsSpec extends SparkSuite {

  private def docs() = {
    Tables.documents(spark, sf).limit(50).createOrReplaceTempView("d_sql")
    spark.table("d_sql")
  }

  test("graft_quality / graft_lang_id match the Column API") {
    val d = docs()
    val viaSql = spark.sql(
      "SELECT doc_id, graft_quality(text) AS q, graft_lang_id(text) AS l FROM d_sql")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    val viaCol = d.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.predLang(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(viaSql === viaCol)
    assert(viaSql.nonEmpty)
  }

  test("graft_simhash64 / graft_fingerprint / graft_shingles match the Column API") {
    val d = docs()
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash64(text) AS sh, graft_fingerprint(text) AS fp,
        |       size(graft_shingles(text)) AS ns
        |FROM d_sql""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    val viaCol = d.select(col("doc_id"),
        TextFunctions.simhash64(TextFunctions.tokenCodes(col("text"))).as("sh"),
        TextFunctions.fingerprint(TextFunctions.tokenCodes(col("text"))).as("fp"),
        size(TextFunctions.shingles3(TextFunctions.tokens(col("text")))).as("ns"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(viaSql === viaCol)
  }

  test("graft_cosine is callable from SQL with numeric-array coercion") {
    val one = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()(0).getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val orth = spark.sql(
      "SELECT graft_cosine(array(1, 0), array(0, 1)) AS c").collect()(0).getDouble(0)
    assert(orth === 0.0)
  }

  test("graft_jaccard equals the array_intersect formulation, incl. edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c"), Seq("b", "c", "d")),   // 2/4
      (2L, Seq("a", "b"), Seq("a", "b")),             // 1.0
      (3L, Seq("a"), Seq("z")),                       // 0.0
      (4L, Seq("x", "x"), Seq("x")),                  // raw sizes: 1/(2+1-1)
      (5L, Seq.empty[String], Seq.empty[String]))     // NULL — a >= tau filter must reject
      .toDF("id", "a", "b")
    val fused = df.select(col("id"), expr("graft_jaccard(a, b)").as("j"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val hof = df.select(col("id"), TextFunctions.jaccard(col("a"), col("b")).as("j"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fused === hof)
    assert(fused(1L) === Some(0.5) && fused(2L) === Some(1.0) &&
      fused(3L) === Some(0.0) && fused(4L) === Some(0.5))
    assert(fused(5L) === None, "empty-vs-empty is NULL, not NaN (NaN passes >= tau)")
    // and the filter semantics that motivated NULL: no row with empty arrays survives
    assert(df.filter(expr("graft_jaccard(a, b) >= 0.0")).count() === 4)
  }

  test("wrong arity fails analysis with a clear error") {
    val e = intercept[Exception](spark.sql("SELECT graft_quality('a', 'b')").collect())
    assert(e.getMessage.contains("graft_quality"))
  }
}
