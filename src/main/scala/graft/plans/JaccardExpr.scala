package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Codegen'd Jaccard similarity over two `array<string>` columns.
  *
  * Drop-in equal to the builtin formulation
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b)))`
  * — distinct intersection count over RAW sizes, NULL when both
  * arrays are empty (as non-ANSI Divide yields on the zero divisor —
  * NOT NaN, which Spark orders above every double and which would
  * therefore PASS a `>= tau` near-dup filter) — but in ONE pass with
  * no intersection array materialized per row. The near-dup verify
  * stage evaluates this once per CANDIDATE PAIR (billions at corpus
  * scale), where array_intersect's per-row output allocation is pure
  * garbage-collector pressure.
  *
  * Null ELEMENTS are not expected (shingle arrays are built from
  * split/concat, never null-bearing); a null ARRAY null-propagates.
  */
case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard requires (array<string>, array<string>) inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"
  // NULL on empty∪empty even when both children are non-nullable
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val na = xa.numElements(); val nb = xb.numElements()
    val setB = new java.util.HashSet[AnyRef](nb * 2)
    var i = 0
    while (i < nb) { setB.add(xb.getUTF8String(i)); i += 1 }
    val seen = new java.util.HashSet[AnyRef](na * 2)
    var inter = 0L
    i = 0
    while (i < na) {
      val e = xa.getUTF8String(i)
      if (setB.contains(e) && seen.add(e)) inter += 1
      i += 1
    }
    if (na + nb == 0) null
    else inter.toDouble / ((na + nb).toDouble - inter.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val setB = ctx.freshName("setB"); val seen = ctx.freshName("seen")
      val inter = ctx.freshName("inter"); val e = ctx.freshName("e")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |java.util.HashSet<Object> $setB = new java.util.HashSet<Object>($nb * 2);
         |for (int $i = 0; $i < $nb; $i++) $setB.add($b.getUTF8String($i));
         |java.util.HashSet<Object> $seen = new java.util.HashSet<Object>($na * 2);
         |long $inter = 0L;
         |for (int $i = 0; $i < $na; $i++) {
         |  Object $e = $a.getUTF8String($i);
         |  if ($setB.contains($e) && $seen.add($e)) $inter++;
         |}
         |if ($na + $nb == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((double) $inter) / (((double) ($na + $nb)) - ((double) $inter));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
