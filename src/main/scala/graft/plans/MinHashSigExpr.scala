package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature over an `array<bigint>` of shingle
  * codes — the candidate-generation primitive behind every banded-LSH
  * dedup pass (d3/d7/d9/d13/d14, Corpus.curate's near-dup stage, the
  * st16 streaming admission sink).
  *
  * The builtin one-pass formulation (aggregate + zip_with + transform)
  * still dispatches an interpreted lambda per (code, permutation) —
  * codes × 16 higher-order calls per row; this expression is one
  * fused codes×16 primitive loop over the SAME permutation tables
  * (TextFunctions.permA/permB — referenced, not copied) and the same
  * integer arithmetic, so signatures are bit-identical (all-integer:
  * no FP ordering question even exists). Empty codes → null, matching
  * the builtin's contract (short docs must not share a bucketable
  * key).
  *
  * Edge contract vs the HOF form (round-10 ADVICE): null array slots
  * are SKIPPED — exactly what the HOF's `least(m, null) = m` does —
  * and each code is pre-reduced `c % P` before the permutation
  * multiply, so the product is bounded by (P−1)·permA + permB < 2^62
  * and can never overflow (where the HOF under Spark 4's default ANSI
  * mode throws on codes ≳ 2^32). Modular arithmetic makes the
  * pre-reduction invisible: for every non-negative code where the HOF
  * succeeds, ((c % P)·a + b) % P == (c·a + b) % P bit-for-bit, so the
  * fused eval is a strict superset of the HOF's domain (well-formed
  * tcode output is < P anyway). Negative codes are out of contract
  * (tcode cannot produce them).
  */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {

  import graft.functions.TextFunctions.{MinhashK, P}

  private val permA: Array[Long] =
    (0 until MinhashK).map(graft.functions.TextFunctions.permA).toArray
  private val permB: Array[Long] =
    (0 until MinhashK).map(graft.functions.TextFunctions.permB).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty codes → null signature
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      val sig = Array.fill(MinhashK)(P)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val c = arr.getLong(i) % P
          var j = 0
          while (j < MinhashK) {
            val h = (c * permA(j) + permB(j)) % P
            if (h < sig(j)) sig(j) = h
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pa = ctx.addReferenceObj("permA", permA, "long[]")
      val pb = ctx.addReferenceObj("permB", permB, "long[]")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$MinhashK];
         |  java.util.Arrays.fill($sig, ${P}L);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) continue;  // HOF parity: least(m, null) = m
         |    long $c = $a.getLong($i) % ${P}L;  // overflow guard, mod-invisible
         |    for (int $j = 0; $j < $MinhashK; $j++) {
         |      long $h = ($c * $pa[$j] + $pb[$j]) % ${P}L;
         |      if ($h < $sig[$j]) $sig[$j] = $h;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
