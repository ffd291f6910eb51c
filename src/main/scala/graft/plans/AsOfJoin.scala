package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
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
    leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Plain ClusteredDistributions: EnsureRequirements co-partitions the
  // two children (same mechanism as SortMergeJoin), and AQE's
  // coalescer shrinks BOTH shuffle stages with identical partition
  // specs because they feed one reduce stage. doExecute still asserts
  // the zip precondition and fails loudly if an optimizer change ever
  // breaks the alignment (instead of silently mis-joining).
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  /** Order-preserving Long extraction for fixed-width types: the merge
    * loop then compares unboxed longs (no Ordering[Any] megamorphic
    * dispatch, no boxing). Floats/doubles use the standard sortable-
    * bits transform (sign-flip for negatives; NaN lands above +Inf,
    * matching Spark's NaN-largest sort order). */
  private def longExtractor(dt: DataType): Option[(InternalRow, Int) => Long] = {
    def bits(d: Double): Long = {
      val b = java.lang.Double.doubleToLongBits(d)
      if (b < 0) b ^ Long.MaxValue else b
    }
    dt match {
      case LongType | TimestampType | TimestampNTZType => Some((r, i) => r.getLong(i))
      case IntegerType | DateType => Some((r, i) => r.getInt(i).toLong)
      case ShortType => Some((r, i) => r.getShort(i).toLong)
      case ByteType => Some((r, i) => r.getByte(i).toLong)
      case DoubleType => Some((r, i) => bits(r.getDouble(i)))
      case FloatType => Some((r, i) => bits(r.getFloat(i).toDouble))
      case _ => None
    }
  }

  /** Ordering for the generic fallback path — used when key or time is
    * variable-width, so it must cover ALL orderable types (a string key
    * still pairs with a long time). Nulls never reach compare —
    * handled structurally in the merge. */
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

  /** Ordinal of `e` in `output` when it's a direct column reference —
    * the common case, where the merge can read key/time straight off
    * the sorted rows instead of materializing a 2-col UnsafeRow per
    * input row. */
  private def directOrdinal(e: Expression, output: Seq[Attribute]): Option[Int] =
    e match {
      case a: Attribute =>
        val i = output.indexWhere(_.exprId == a.exprId)
        if (i >= 0) Some(i) else None
      case _ => None
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val nRight = right.output.size
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val lKo = directOrdinal(leftKey, left.output)
    val lTo = directOrdinal(leftTime, left.output)
    val rKo = directOrdinal(rightKey, right.output)
    val rTo = directOrdinal(rightTime, right.output)
    // SQL as-of semantics (= DuckDB ASOF JOIN): NULL key or time never
    // matches — left rows with either null emit the null-padded row,
    // right rows with either null are skipped.
    (longExtractor(keyDt), longExtractor(timeDt)) match {
      case (Some(getKey), Some(getTime)) =>
        left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
          // prep = identity + stored ordinals when key/time are plain
          // column refs; otherwise one codegen'd 2-col projection
          val (lPrep, lki, lti): (InternalRow => InternalRow, Int, Int) = (lKo, lTo) match {
            case (Some(k), Some(t)) => (identity[InternalRow] _, k, t)
            case _ =>
              val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
                .create(Seq(leftKey, leftTime), left.output)
              ((r: InternalRow) => proj(r), 0, 1)
          }
          val (rPrep, rki, rti): (InternalRow => InternalRow, Int, Int) = (rKo, rTo) match {
            case (Some(k), Some(t)) => (identity[InternalRow] _, k, t)
            case _ =>
              val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
                .create(Seq(rightKey, rightTime), right.output)
              ((r: InternalRow) => proj(r), 0, 1)
          }
          val rightNulls = new GenericInternalRow(nRight)
          val joined = new JoinedRow
          // current (un-consumed) right row; nulls-first sort puts
          // null-key/time rows at the front of their runs, so eager
          // skipping preserves the two-pointer invariant
          var rRow: InternalRow = null
          var rk = 0L
          var rt = 0L
          def advanceRight(): Unit = {
            rRow = null
            while (rRow == null && rIter.hasNext) {
              val r = rIter.next()
              val p = rPrep(r)
              if (!p.isNullAt(rki) && !p.isNullAt(rti)) {
                rRow = r; rk = getKey(p, rki); rt = getTime(p, rti)
              }
            }
          }
          advanceRight()
          // the match candidate is copied into ONE reused buffer —
          // no per-row allocation in the merge loop
          val matchBuf = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(nRight)
          matchBuf.pointTo(new Array[Byte](64), 64)
          lazy val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
            .create(right.output, right.output)
          var haveMatch = false
          var matchKey = 0L
          lIter.map { l =>
            val p = lPrep(l)
            if (p.isNullAt(lki) || p.isNullAt(lti)) joined(l, rightNulls)
            else {
              val lk = getKey(p, lki)
              val lt = getTime(p, lti)
              while (rRow != null && (rk < lk || (rk == lk && rt <= lt))) {
                if (rk == lk) {
                  rRow match {
                    case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
                      matchBuf.copyFrom(u)
                    case other => matchBuf.copyFrom(toUnsafe(other))
                  }
                  matchKey = lk; haveMatch = true
                }
                advanceRight()
              }
              if (haveMatch && matchKey == lk) joined(l, matchBuf)
              else joined(l, rightNulls)
            }
          }
        }
      case _ =>
        val keyOrd = atomicOrdering(keyDt)
        val timeOrd = atomicOrdering(timeDt)
        left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
          val lProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
            .create(Seq(leftKey, leftTime), left.output)
          val rProj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
            .create(Seq(rightKey, rightTime), right.output)
          // projection buffers are reused — detach variable-width values
          def freeze(v: Any): Any = v match {
            case s: UTF8String => s.clone()
            case d: org.apache.spark.sql.types.Decimal =>
              org.apache.spark.sql.types.Decimal(d.toJavaBigDecimal)
            case x => x
          }
          val rightNulls = new GenericInternalRow(nRight)
          val joined = new JoinedRow
          var rRow: InternalRow = null
          var rk: Any = null
          var rt: Any = null
          def advanceRight(): Unit = {
            rRow = null
            while (rRow == null && rIter.hasNext) {
              val r = rIter.next()
              val p = rProj(r)
              if (!p.isNullAt(0) && !p.isNullAt(1)) {
                rRow = r
                rk = freeze(p.get(0, keyDt)); rt = freeze(p.get(1, timeDt))
              }
            }
          }
          advanceRight()
          var matchRow: InternalRow = null
          var matchKey: Any = null
          lIter.map { l =>
            val p = lProj(l)
            if (p.isNullAt(0) || p.isNullAt(1)) joined(l, rightNulls)
            else {
              val lk = freeze(p.get(0, keyDt))
              val lt = freeze(p.get(1, timeDt))
              while (rRow != null && {
                val kc = keyOrd.compare(rk, lk)
                kc < 0 || (kc == 0 && timeOrd.compare(rt, lt) <= 0)
              }) {
                if (keyOrd.compare(rk, lk) == 0) { matchKey = rk; matchRow = rRow.copy() }
                advanceRight()
              }
              if (matchRow != null && keyOrd.compare(matchKey, lk) == 0) joined(l, matchRow)
              else joined(l, rightNulls)
            }
          }
        }
    }
  }

  // ------------------------------------------------------------------
  // Whole-stage codegen (SURVEY §7 backlog, round 11): the same
  // two-pointer merge as doExecute, emitted as one fused loop inside
  // the stage — SortMergeJoin's two-input produce contract
  // (inputRDDs returns both sorted children; WholeStageCodegenExec
  // zips them), but with a single buffered right row instead of a
  // match buffer, so the generated state is four scalars + one reused
  // UnsafeRow. Covers the fixed-width fast path (key and time both
  // long-extractable — every registered caller); variable-width
  // key/time keeps the interpreted fallback via supportCodegen=false.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def supportCodegen: Boolean =
    longExtractor(leftKey.dataType).isDefined &&
      longExtractor(leftTime.dataType).isDefined

  // output rows reference the reused match buffer / iterator rows —
  // a buffering parent must copy (the SortMergeJoin rule)
  override def needCopyResult: Boolean = true

  /** Java source for the order-preserving long of a fixed-width value
    * — the codegen twin of [[longExtractor]]'s lambdas. */
  private def genLongOf(ctx: CodegenContext, dt: DataType, v: String): String = {
    lazy val bits = ctx.addNewFunction("graftSortableBits",
      s"""
         |private long graftSortableBits(double d) {
         |  long b = Double.doubleToLongBits(d);
         |  return b < 0 ? b ^ Long.MAX_VALUE : b;
         |}
       """.stripMargin)
    dt match {
      case LongType | TimestampType | TimestampNTZType => v
      case IntegerType | DateType | ShortType | ByteType => s"(long) ($v)"
      case DoubleType => s"$bits($v)"
      case FloatType => s"$bits((double) ($v))"
      case other => throw new UnsupportedOperationException(
        s"as-of codegen reached with non-fixed-width type $other")
    }
  }

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "graftAsofLeftIn",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "graftAsofRightIn",
      v => s"$v = inputs[1];")
    val rightRow = ctx.addMutableState("InternalRow", "graftAsofRightRow")
    val rightKeyVar = ctx.addMutableState("long", "graftAsofRightKey")
    val rightTimeVar = ctx.addMutableState("long", "graftAsofRightTime")
    val started = ctx.addMutableState("boolean", "graftAsofStarted")
    val hasMatchVar = ctx.addMutableState("boolean", "graftAsofHasMatch")
    val matchKeyVar = ctx.addMutableState("long", "graftAsofMatchKey")
    val matchBuf = ctx.addMutableState("UnsafeRow", "graftAsofMatchBuf",
      v => s"$v = new UnsafeRow(${right.output.size}); $v.pointTo(new byte[64], 64);")
    // sorted shuffle output is UnsafeRow; the projection is the same
    // belt-and-braces fallback the interpreted path carries
    val schemaRef = ctx.addReferenceObj("graftAsofRightSchema", right.schema,
      "org.apache.spark.sql.types.StructType")
    val toUnsafe = ctx.addMutableState(
      "org.apache.spark.sql.catalyst.expressions.UnsafeProjection", "graftAsofToUnsafe",
      v => s"$v = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create($schemaRef);")

    // --- advanceRight(): skip null-key/time rows, cache sortable longs
    val rRowTerm = ctx.freshName("graftAsofRRow")
    ctx.INPUT_ROW = rRowTerm
    ctx.currentVars = null
    val rKeyEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rTimeEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val advanceRight = ctx.addNewFunction("graftAsofAdvanceRight",
      s"""
         |private void graftAsofAdvanceRight() {
         |  $rightRow = null;
         |  while ($rightRow == null && $rightInput.hasNext()) {
         |    InternalRow $rRowTerm = (InternalRow) $rightInput.next();
         |    ${rKeyEv.code}
         |    ${rTimeEv.code}
         |    if (!(${rKeyEv.isNull}) && !(${rTimeEv.isNull})) {
         |      $rightRow = $rRowTerm;
         |      $rightKeyVar = ${genLongOf(ctx, rightKey.dataType, rKeyEv.value.toString)};
         |      $rightTimeVar = ${genLongOf(ctx, rightTime.dataType, rTimeEv.value.toString)};
         |    }
         |  }
         |}
       """.stripMargin)

    // --- the produce loop over left rows
    val lRowTerm = ctx.freshName("graftAsofLRow")
    ctx.INPUT_ROW = lRowTerm
    ctx.currentVars = null
    val lKeyEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val lTimeEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // right-side outputs: declared before the match check, read from
    // the copied buffer only when this left row has a match — the
    // null-padded branch costs no buffer access at all
    val useMatch = ctx.freshName("graftAsofUseMatch")
    ctx.INPUT_ROW = matchBuf
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val ev = BoundReference(i, a.dataType, nullable = true).genCode(ctx)
      val isNull = ctx.freshName("graftAsofIsNull")
      val value = ctx.freshName("graftAsofVal")
      val jt = CodeGenerator.javaType(a.dataType)
      val block =
        code"""
              |boolean $isNull = true;
              |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
              |if ($useMatch) {
              |  ${ev.code}
              |  $isNull = ${ev.isNull};
              |  $value = ${ev.value};
              |}
            """.stripMargin
      ExprCode(block, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val lk = ctx.freshName("graftAsofLk")
    val lt = ctx.freshName("graftAsofLt")
    s"""
       |if (!$started) { $started = true; $advanceRight(); }
       |while ($leftInput.hasNext()) {
       |  InternalRow $lRowTerm = (InternalRow) $leftInput.next();
       |  ${lKeyEv.code}
       |  ${lTimeEv.code}
       |  boolean $useMatch = false;
       |  if (!(${lKeyEv.isNull}) && !(${lTimeEv.isNull})) {
       |    long $lk = ${genLongOf(ctx, leftKey.dataType, lKeyEv.value.toString)};
       |    long $lt = ${genLongOf(ctx, leftTime.dataType, lTimeEv.value.toString)};
       |    while ($rightRow != null &&
       |        ($rightKeyVar < $lk || ($rightKeyVar == $lk && $rightTimeVar <= $lt))) {
       |      if ($rightKeyVar == $lk) {
       |        if ($rightRow instanceof UnsafeRow) {
       |          $matchBuf.copyFrom((UnsafeRow) $rightRow);
       |        } else {
       |          $matchBuf.copyFrom($toUnsafe.apply($rightRow));
       |        }
       |        $matchKeyVar = $lk;
       |        $hasMatchVar = true;
       |      }
       |      $advanceRight();
       |    }
       |    $useMatch = $hasMatchVar && $matchKeyVar == $lk;
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    // The merge compares left/right key (and time) values with ONE
    // ordering chosen from the LEFT type — a mismatched right type
    // would otherwise surface only as an opaque codegen/ClassCast
    // failure deep in execution. Fail at call time with the actual
    // types instead (same-type requirement, no implicit widening:
    // cast explicitly if you mean it).
    def sameType(side: String, l: Attribute, r: Attribute): Unit =
      if (l.dataType != r.dataType) throw new IllegalArgumentException(
        s"as-of join $side types must match exactly: left ${l.name} is " +
          s"${l.dataType.simpleString}, right ${r.name} is ${r.dataType.simpleString} " +
          "(cast one side before joining)")
    sameType("key", lk, rk)
    sameType("time", lt, rt)
    GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, lk, rk, lt, rt))
  }
}
