package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * Key and time expressions may be any orderable atomic type
  * (integral, floating, string, date/timestamp).
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

  /** Ordering over evaluated atomic values (nulls don't reach here:
    * rows with null key/time sort first and compare via the generic
    * path below). */
  private def atomicOrdering(dt: DataType): Ordering[Any] = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      Ordering.by((v: Any) => v.asInstanceOf[Long])
    case IntegerType | DateType => Ordering.by((v: Any) => v.asInstanceOf[Int])
    case ShortType => Ordering.by((v: Any) => v.asInstanceOf[Short])
    case ByteType => Ordering.by((v: Any) => v.asInstanceOf[Byte])
    case DoubleType => Ordering.by((v: Any) => v.asInstanceOf[Double])
    case FloatType => Ordering.by((v: Any) => v.asInstanceOf[Float])
    case StringType => new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    }
    case _: DecimalType => new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        a.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .compareTo(b.asInstanceOf[org.apache.spark.sql.types.Decimal])
    }
    case other => throw new UnsupportedOperationException(
      s"as-of join key/time type not orderable here: $other")
  }

  /** Null-safe wrapper: nulls first (matches SortOrder Ascending). */
  private def nullsFirst(ord: Ordering[Any]): Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ord.compare(a, b)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val nRight = right.output.size
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val keyOrd = nullsFirst(atomicOrdering(keyDt))
    val timeOrd = nullsFirst(atomicOrdering(timeDt))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd (key, time) projections — one generated evaluator per
      // partition instead of interpreted per-row expression trees
      val lProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(Seq(leftKey, leftTime), left.output)
      val rProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(Seq(rightKey, rightTime), right.output)
      // projection output buffers are reused across calls — variable-
      // width values (strings/decimals) must be detached before storing
      def freeze(v: Any): Any = v match {
        case s: UTF8String => s.clone()
        case d: org.apache.spark.sql.types.Decimal =>
          org.apache.spark.sql.types.Decimal(d.toJavaBigDecimal)
        case x => x
      }
      val rightNulls = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val rBuf = rIter.map { r =>
        val c = r.copy() // upstream sort reuses its row buffer
        val p = rProj(c)
        (freeze(if (p.isNullAt(0)) null else p.get(0, keyDt)),
          freeze(if (p.isNullAt(1)) null else p.get(1, timeDt)), c)
      }.buffered
      var matchKey: Any = null
      var matchRow: InternalRow = null
      lIter.map { l =>
        val p = lProj(l)
        val lk = if (p.isNullAt(0)) null else p.get(0, keyDt)
        val lt = if (p.isNullAt(1)) null else p.get(1, timeDt)
        while (rBuf.hasNext && {
          val kc = keyOrd.compare(rBuf.head._1, lk)
          kc < 0 || (kc == 0 && timeOrd.compare(rBuf.head._2, lt) <= 0)
        }) {
          val (k, _, row) = rBuf.next()
          if (keyOrd.compare(k, lk) == 0) { matchKey = k; matchRow = row }
        }
        if (matchRow != null && keyOrd.compare(matchKey, lk) == 0) joined(l, matchRow)
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
    * columns null when no such row). Key/time columns may be any
    * orderable atomic type. Column names must not collide — alias the
    * right side first. */
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
