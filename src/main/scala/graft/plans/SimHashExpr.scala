package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd SimHash over an `array<bigint>` of token/gram codes —
  * the sketch behind d4/d7/d8-adjacent near-dup pairs (16-bit form)
  * and the 64-bit scale variant mm8's perceptual hash and
  * `simhash64CandidatePairs` band on.
  *
  * The builtin single-pass HOF form still dispatches a lambda per
  * (code, bit) — codes × (bits+1) interpreted calls; this expression
  * is one fused primitive loop with the IDENTICAL per-bit hash
  * formulas (16-bit: bit test on one Lehmer hash per code; 64-bit:
  * the double-mod parity per (code, bit)) and the same majority rule
  * (2·count_b > n), so sketches are bit-equal — all-integer, no FP
  * question. Empty codes → 0, matching the builtin.
  *
  * Edge contract vs the HOF form (round-10 ADVICE): a null array slot
  * makes every HOF bit-sum null, so every strict-majority test fails
  * and the HOF returns 0 — the fused eval short-circuits to the same
  * 0 on the first null slot. Codes are pre-reduced `c % P` before the
  * Lehmer multiply, bounding the product under 2^62 (no overflow,
  * where the ANSI HOF throws on codes ≳ 2^33); the pre-reduction is
  * invisible mod P for every non-negative code the HOF accepts, and
  * well-formed tcode output is < P anyway. Negative codes are out of
  * contract (tcode cannot produce them).
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits == 16 || bits == 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_codes: bits must be 16 or 64, got $bits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_codes requires array<bigint> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // HOF parity: null bit-sums → all-bits 0
      val c = arr.getLong(i) % P     // overflow guard, mod-invisible
      if (bits == 16) {
        val h = (c * 1103515245L + 12345L) % P
        var b = 0
        while (b < 16) { if ((h & (1L << b)) > 0) cnt(b) += 1; b += 1 }
      } else {
        var b = 0
        while (b < 64) {
          val v = (c * 1103515245L + b * 2654435761L + 12345L) % P
          if (((v * 48271L) % P) % 2 == 1) cnt(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (cnt(b) * 2 > n) out += (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      val cnt = ctx.freshName("cnt"); val out = ctx.freshName("out")
      val inner =
        if (bits == 16)
          s"""long $h = ($c * 1103515245L + 12345L) % ${P}L;
             |for (int $b = 0; $b < 16; $b++) {
             |  if (($h & (1L << $b)) > 0) $cnt[$b]++;
             |}""".stripMargin
        else
          s"""for (int $b = 0; $b < 64; $b++) {
             |  long $v = ($c * 1103515245L + $b * 2654435761L + 12345L) % ${P}L;
             |  if ((($v * 48271L) % ${P}L) % 2L == 1L) $cnt[$b]++;
             |}""".stripMargin
      val nullHit = ctx.freshName("nullHit")
      s"""
         |int $n = $a.numElements();
         |long[] $cnt = new long[$bits];
         |boolean $nullHit = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $nullHit = true; break; }
         |  long $c = $a.getLong($i) % ${P}L;
         |  $inner
         |}
         |long $out = 0L;
         |if (!$nullHit) {
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ($cnt[$b] * 2L > $n) $out += (1L << $b);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
