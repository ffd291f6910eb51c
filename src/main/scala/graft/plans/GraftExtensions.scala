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
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityExpr(children(0), children(1))))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
