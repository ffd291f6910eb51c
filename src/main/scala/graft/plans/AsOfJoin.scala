package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** AS-OF JOIN as a first-class Catalyst operator (SURVEY.md round-2
  * backlog, pulled into round 1): for every left row, attach the
  * latest right row of the same key with right.time <= left.time.
  *
  * Physical plan: both sides hash-partitioned on the key and sorted by
  * (key, time) — ONE shuffle each, then a streaming two-pointer merge
  * per partition. No range-condition cross join, no row explosion, no
  * per-key state beyond a single buffered right row: the shape that
  * survives 100 TB with skewed keys (AQE can still split a hot
  * partition upstream of the sort).
  *
  * Round-1 contract: key and time expressions must be LongType (ids /
  * epoch-ms). Generic orderings are a planned extension.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Pin the partition count so both children shuffle to identical
  // layouts (and AQE cannot coalesce one side independently).
  private def numParts = SQLConf.get.numShufflePartitions
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(numParts)),
    ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(numParts)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val nRight = right.output.size
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rightNulls = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // right side with key/time materialized; rows copied once when
      // buffered (iterator rows are reused by the upstream sort)
      val rBuf = rIter.map { r =>
        (rKey.eval(r).asInstanceOf[Long], rTime.eval(r).asInstanceOf[Long], r.copy())
      }.buffered
      var matchKey = 0L
      var matchRow: InternalRow = null
      lIter.map { l =>
        val lk = lKey.eval(l).asInstanceOf[Long]
        val lt = lTime.eval(l).asInstanceOf[Long]
        while (rBuf.hasNext &&
          (rBuf.head._1 < lk || (rBuf.head._1 == lk && rBuf.head._2 <= lt))) {
          val (k, _, row) = rBuf.next()
          if (k == lk) { matchKey = k; matchRow = row }
        }
        if (matchRow != null && matchKey == lk) joined(l, matchRow)
        else joined(l, rightNulls)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Public API. */
object AsOf {

  /** As-of join `left` with `right`: each left row gets the latest
    * right row with the same key and rightTime <= leftTime (right
    * columns null when no such row). Key/time columns must be LongType.
    * Column names must not collide — alias the right side first. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lp = GraftSqlBridge.analyzed(left)
    val rp = GraftSqlBridge.analyzed(right)
    def attr(p: LogicalPlan, name: String) = p.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime)))
  }
}
