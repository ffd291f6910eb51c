package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd L2 unit-normalization of an `array<float>` column:
  * returns `array<double>` with each element divided by the vector's
  * L2 norm, or NULL when the norm is zero (callers filter NULLs — the
  * historical `filter(__n > 0)` gate).
  *
  * The builtin formulation (norm via transform+aggregate, then a
  * second transform dividing by it) walks the array three times
  * through INTERPRETED higher-order lambdas — Spark's
  * HigherOrderFunction has no doGenCode, so every element pays an
  * expression-tree walk plus a boxed NamedLambdaVariable binding.
  * Measured on the s18 training path at ×10 (20k × 64-dim): the
  * interpreted normalization pass costs ~7.7 s per materialization vs
  * milliseconds for this fused loop — it was the entire s18 wall.
  *
  * Math is IDENTICAL to pqNormed's fold (cast each float to double,
  * accumulate squares in ascending index order, sqrt once, divide
  * each element), so swapping one for the other cannot change results
  * or oracle parity — the same double sequence, bit for bit.
  */
case class UnitNormExpr(child: Expression) extends UnaryExpression {

  // getFloat reads 4-byte slots — reject anything but array<float> at
  // analysis (the SQL builder in GraftExtensions casts other numeric
  // arrays before this check runs)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unitnorm requires array<float> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // zero-norm input → NULL
  override def prettyName: String = "graft_unitnorm"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = xs.getFloat(i).toDouble; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    if (!(nrm > 0)) null
    else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = xs.getFloat(i).toDouble / nrm; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val ss = ctx.freshName("ss"); val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double __x = (double) $a.getFloat($i);
         |  $ss += __x * __x;
         |}
         |double $nrm = java.lang.Math.sqrt($ss);
         |if (!($nrm > 0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (double) $a.getFloat($i) / $nrm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
