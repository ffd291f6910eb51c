package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer dot product over two array<bigint> columns — the
  * SQ8 coarse-scan primitive (Similarity.sq8RerankTopK's `cdot`).
  *
  * The composed form (`aggregate(zip_with(a, b, a·b), 0, +)`) runs an
  * interpreted lambda per element per PAIR — the coarse scan is
  * |queries|×|corpus| pairs × dims dispatches, the LshDotsExpr lesson
  * on the one remaining un-fused pair loop. One primitive long loop,
  * same left-to-right fold: Σ ascending a[i]·b[i] from 0 — pure
  * integer arithmetic, so fused == HOF needs no FP argument at all
  * (and |codes| ≤ 127 ⇒ |dot| ≤ dims·127² — no overflow for any sane
  * dimension count; the HOF under ANSI mode would throw at the same
  * magnitudes this would wrap, both unreachable).
  *
  * PRECONDITIONS (LshDotsExpr's class): element non-null, equal
  * lengths — both hold for sq8 code arrays (transform outputs over
  * fixed-width embeddings; zip_with on unequal lengths would null-pad
  * where this reads the shorter length).
  */
case class LongDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_long_dot requires two array<bigint> inputs, " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_long_dot"

  override protected def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
