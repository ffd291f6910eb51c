package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions for the graft engine — registers the custom
  * codegen'd expressions so they're usable from SQL and
  * `call_function`. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (done by Verify/Bench/test sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_cosine",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        // SQL callers may pass array<double>/array<int> (e.g. literal
        // arrays) — insert an explicit cast so getFloat never reads
        // wrong-width slots; non-numeric arrays fall through to the
        // expression's own analysis failure
        import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
        import org.apache.spark.sql.types.{ArrayType, FloatType, NumericType}
        def coerce(e: Expression): Expression =
          if (!e.resolved) e
          else e.dataType match {
            case ArrayType(FloatType, _) => e
            case ArrayType(_: NumericType, n) => Cast(e, ArrayType(FloatType, n))
            case _ => e
          }
        CosineSimilarityExpr(coerce(children(0)), coerce(children(1)))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_unitnorm"),
      new ExpressionInfo(classOf[UnitNormExpr].getName, "graft_unitnorm"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 1) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_unitnorm",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
        import org.apache.spark.sql.types.{ArrayType, FloatType, NumericType}
        def coerce(e: Expression): Expression =
          if (!e.resolved) e
          else e.dataType match {
            case ArrayType(FloatType, _) => e
            case ArrayType(_: NumericType, n) => Cast(e, ArrayType(FloatType, n))
            case _ => e
          }
        UnitNormExpr(coerce(children(0)))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardExpr].getName, "graft_jaccard"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_jaccard",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        JaccardExpr(children(0), children(1))
      }))

    e.injectFunction((
      FunctionIdentifier("graft_lsh_dots"),
      new ExpressionInfo(classOf[LshDotsExpr].getName, "graft_lsh_dots"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        children match {
          case Seq(emb, Literal(planes: Int, IntegerType), Literal(off: Int, IntegerType)) =>
            LshDotsExpr(emb, planes, off)
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_lsh_dots",
              "expectedNum" -> "3 (array, int literal planes, int literal offset)",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
      }))

    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 1) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_minhash",
              "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        MinHashSigExpr(children(0))
      }))

    e.injectFunction((
      FunctionIdentifier("graft_simhash_codes"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash_codes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        children match {
          case Seq(codes, Literal(bits: Int, IntegerType)) => SimHashExpr(codes, bits)
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_simhash_codes",
              "expectedNum" -> "2 (array<bigint>, int literal bits)",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
      }))

    // Mergeable-summary aggregates (SketchAggs): SQL surface for the
    // engine-primitive sketches — k/d/w arrive as int literals.
    e.injectFunction((
      FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        children match {
          case Seq(h, id, Literal(k: Int, IntegerType)) => KmvSketchAgg(h, id, k)
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_kmv_sketch",
              "expectedNum" -> "3 (hash, id, int literal k)",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
      }))
    e.injectFunction((
      FunctionIdentifier("graft_cm_sketch"),
      new ExpressionInfo(classOf[CmSketchAgg].getName, "graft_cm_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        children match {
          case Seq(key, wt, Literal(d: Int, IntegerType), Literal(w: Int, IntegerType)) =>
            CmSketchAgg(key, wt, d, w)
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_cm_sketch",
              "expectedNum" -> "4 (key, weight, int literal d, int literal w)",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
      }))

    e.injectPlannerStrategy(_ => AsOfJoinStrategy)

    // SQL-surface parity for the text-analysis library: the same
    // Column compositions the Scala API uses, registered as SQL
    // functions (they expand to standard codegen'd expressions at
    // analysis, so SQL callers get the identical plan — and identical
    // oracle-parity semantics — as DataFrame callers).
    def injectComposed(name: String, arity: Int)(
        build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.TextFunctions", name),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          if (children.length != arity) {
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name,
                "expectedNum" -> arity.toString,
                "actualNum" -> children.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          }
          org.apache.spark.sql.GraftSqlBridge.expression(
            build(children.map(org.apache.spark.sql.GraftSqlBridge.columnOf)))
        }))

    import graft.functions.TextFunctions
    injectComposed("graft_quality", 1)(cs => TextFunctions.qualityScore(cs(0)))
    injectComposed("graft_lang_id", 1)(cs => TextFunctions.predLang(cs(0)))
    injectComposed("graft_fingerprint", 1)(cs =>
      TextFunctions.fingerprint(TextFunctions.tokenCodes(cs(0))))
    injectComposed("graft_simhash64", 1)(cs =>
      TextFunctions.simhash64(TextFunctions.tokenCodes(cs(0))))
    injectComposed("graft_shingles", 1)(cs =>
      TextFunctions.shingles3(TextFunctions.tokens(cs(0))))
  }
}
