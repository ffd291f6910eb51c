package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd random-hyperplane dot products — the per-plane signal
  * behind every LSH bucket and multi-probe list in the engine
  * (Similarity.lshDots).
  *
  * The builtin formulation (`transform(sequence, p =>
  * aggregate(zip_with(...)))`) dispatches an interpreted lambda per
  * (plane, dimension) — planes × dims × 3 higher-order calls per row,
  * the mm8 lesson on the ANN path. This expression is one fused
  * planes×dims primitive loop: the pseudo-random ±1 sign is computed
  * inline with the SAME integer arithmetic (Lehmer re-multiply mod
  * 2^31−1, 1-based dimension index) and doubles accumulate in the
  * SAME ascending-dimension order, so the result is bit-identical to
  * the HOF form and oracle parity is untouched.
  *
  * Accepts array<float> (stored embeddings) and array<double> (s15's
  * norm-augmented vectors) — the accessor is chosen at analysis time.
  *
  * PRECONDITION (round-10 ADVICE, documented rather than guarded):
  * array elements must be non-null. Every caller feeds parquet-stored
  * embedding arrays (zero null elements in the corpus — a DATA-level
  * invariant asserted by SimilaritySpec) or arithmetic derivatives of
  * them; a null element here reads as 0.0 where the HOF form would
  * null the whole per-plane dot. Guarding would force
  * containsNull=true on the output array and ripple nullability into
  * every bucket column's schema, so the contract is enforced at the
  * source instead.
  */
case class LshDotsExpr(child: Expression, planes: Int, planeOffset: Int)
    extends UnaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (planes >= 1 && planes <= 62 && planeOffset >= 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_dots: planes must be in [1, 62] and planeOffset >= 0, " +
          s"got ($planes, $planeOffset)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_dots requires array<float> or array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_lsh_dots"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](planes)
    var j = 0
    while (j < planes) {
      val p = (planeOffset + j).toLong
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val v = ((i + 1).toLong * 1103515245L + p * 2654435761L + 12345L) % P
        val sgn = if (((v * 48271L) % P) % 2 == 1) 1.0 else -1.0
        acc += x * sgn
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val p = ctx.freshName("p"); val v = ctx.freshName("v")
      val x = ctx.freshName("x"); val out = ctx.freshName("out")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$planes];
         |for (int $j = 0; $j < $planes; $j++) {
         |  long $p = (long) ($planeOffset + $j);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $get;
         |    long $v = (($i + 1L) * 1103515245L + $p * 2654435761L + 12345L) % ${P}L;
         |    $acc += $x * (((($v * 48271L) % ${P}L) % 2L == 1L) ? 1.0 : -1.0);
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
