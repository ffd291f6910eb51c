package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a ROLLING fixed-window
  * polynomial (Rabin) hash — the boundary-shift-robust replacement for
  * mm10's fixed 32-byte grid (round-17 VERDICT directive 2: a one-byte
  * insertion shifts every fixed-grid boundary, so the chunk store
  * reclaims ~nothing on prefix-shifted re-encodes, the commonest real
  * duplication pattern).
  *
  * Position i (1-based, i ≥ window) is a boundary iff
  * `H(i) mod divisor == 0`, where H(i) is the degree-(window−1)
  * polynomial of the LAST `window` bytes mod `mod`:
  * `H(i) = Σ_{k=0..W−1} byte(i−W+1+k) · base^(W−1−k)  (mod mod)`.
  * Because H(i) depends ONLY on the window's content — never on
  * absolute offset or accumulated chunk state — an insertion or
  * deletion perturbs boundaries only within `window` bytes of the
  * edit; every later boundary shifts with the content and the chunks
  * between them are byte-identical, which is what lets a chunk store
  * dedup a shifted re-encode (the FastCDC/LBFS argument, in its
  * stateless fixed-window form so a SQL oracle can replay it
  * position-by-position with the direct sum — congruent to this
  * rolling form by mod arithmetic).
  *
  * Integer-portable throughout (t4's polynomial discipline): bytes as
  * 0..255, base/mod/divisor small enough that every intermediate fits
  * a 64-bit signed integer (h·base + 255 < mod·base ≈ 3.1e10;
  * leaving-byte product ≤ 255·(mod−1) ≈ 2.6e11). Expected chunk
  * length ≈ divisor bytes; a text shorter than `window` has no
  * boundary (one whole-text chunk downstream). ASCII corpus ⇒ byte ==
  * code point, the mm2-documented equivalence the DuckDB twin leans
  * on (the expression itself is byte-defined and handles any bytes).
  *
  * Codegen'd (BpeCountExpr's class): one primitive O(len) loop per
  * row, zero lambda dispatch, output = int[] of 1-based boundary
  * positions.
  */
case class CdcBoundariesExpr(child: Expression, window: Int,
    base: Long, mod: Long, divisor: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (window >= 2 && base >= 2 && mod >= 2 && divisor >= 2 &&
          base < Int.MaxValue && mod <= 4000000000L)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_boundaries: need window/base/mod/divisor >= 2 and " +
          s"mod <= 4e9 (64-bit headroom), got ($window, $base, $mod, $divisor)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_boundaries requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries"

  /** base^window mod `mod` — the leaving byte's weight. */
  private lazy val baseToW: Long = {
    var p = 1L
    var k = 0
    while (k < window) { p = p * base % mod; k += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bts = input.asInstanceOf[UTF8String].getBytes
    val n = bts.length
    val buf = new Array[Int](if (n >= window) n - window + 1 else 0)
    var cnt = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * base + (bts(i) & 0xff)) % mod
      if (i >= window) {
        h = (h - (bts(i - window) & 0xff).toLong * baseToW) % mod
        if (h < 0) h += mod
      }
      if (i >= window - 1 && h % divisor == 0L) { buf(cnt) = i + 1; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bts = ctx.freshName("bts"); val n = ctx.freshName("n")
      val buf = ctx.freshName("buf"); val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |byte[] $bts = $a.getBytes();
         |int $n = $bts.length;
         |int[] $buf = new int[$n >= $window ? ($n - $window + 1) : 0];
         |int $cnt = 0;
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${base}L + ($bts[$i] & 0xff)) % ${mod}L;
         |  if ($i >= $window) {
         |    $h = ($h - (long) ($bts[$i - $window] & 0xff) * ${baseToW}L) % ${mod}L;
         |    if ($h < 0) $h += ${mod}L;
         |  }
         |  if ($i >= ${window - 1} && $h % ${divisor}L == 0L) { $buf[$cnt++] = $i + 1; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
