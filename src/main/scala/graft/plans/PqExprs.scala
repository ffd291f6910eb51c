package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Codegen'd product-quantization primitives (Similarity.s11/s16's
  * hot path).
  *
  * The composed formulation encodes a corpus row by EXPLODING it into
  * M·K (subspace, codeword) rows through a broadcast join, folding
  * each distance with interpreted `aggregate(zip_with(...))` lambdas,
  * and re-aggregating with a `groupBy(cand_id, s)` SHUFFLE — then pays
  * a second (corpus×M)-row shuffle to sum the ADC lookups. Both
  * shuffles carry data that never needed to leave the row: the
  * codebook is M·K·subDim doubles (~8 KB), broadcast-able into the
  * expression itself. These three expressions keep the whole PQ scan
  * inside whole-stage codegen with zero row inflation:
  *
  *  - [[PqCodesExpr]]: RAW vector → array<int> of M codeword
  *    POSITIONS (L2-normalize, then argmin L2² per subspace, ties to
  *    the lower position — the bit-exact twin of
  *    `min_by(cw_id, struct(dist, cw_id))` over a cw_id-ascending
  *    codebook of normalized codewords).
  *  - [[PqDistTableExpr]]: RAW query vector → array<double> of all
  *    M·K subspace-to-codeword L2² values (the ADC lookup table).
  *  - [[PqAdcExpr]]: (codes, table) → the ADC sum, folded in
  *    ascending-subspace order (the fixed d0+d1+...+d{M-1}
  *    association of the composed pivot form).
  *
  * Normalization lives INSIDE the expression: feeding it the
  * `transform(embedding, x -> x / __n)` column instead was measured
  * at 37 s for a 200k-vector encode — project collapse inlines the
  * whole normSq fold into the HOF lambda, recomputing a 64-element
  * aggregate PER ELEMENT in interpreted mode. Here the vector loads
  * into a local double[dim] ONCE per row (cast → ÷norm), and the
  * normalization replays the composed path's exact IEEE sequence:
  * nsq = ascending fold of x·x from 0.0 (VectorFunctions.normSq),
  * n = sqrt(nsq), element = cast(x)/n — so results stay bit-identical
  * to `pqNormed` + composed scoring, and to the DuckDB twin
  * (parity spec'd in SimilaritySpec).
  *
  * The codebook ships as a flattened codeword-major double array
  * (cb[cw·dim + j] = NORMALIZED codeword cw, element j) embedded in
  * the expression — collected driver-side from the K-row codebook
  * frame (the documented O(1)-driver class: sizedPlanes' count()).
  * Library-internal (constructed via GraftSqlBridge.columnOf, not
  * SQL-registered: an embedded array object has no SQL literal form).
  *
  * PRECONDITIONS (LshDotsExpr's class): array elements non-null,
  * norm > 0 (callers keep s9's `norm > 0` filter — a zero norm here
  * would produce NaN distances, and Java `<` tie-breaks NaN
  * differently than Spark's struct ordering), vectors at least
  * m·subDim long.
  */
object PqExprs {
  /** Dimension guard shared by the interpreted and codegen'd paths: a
    * shorter-than-m·subDim vector through the public
    * `pqAdcRerankTopKFused` would otherwise be a SILENT out-of-bounds
    * read on UnsafeArrayData (garbage distances, no error). One branch
    * per row, negligible next to the m·kCw·subDim distance loop. */
  // public (not private[plans]): called from generated Java via the
  // static forwarder, which only exists for public members
  def checkDim(n: Int, dim: Int): Unit =
    if (n < dim) throw new IllegalArgumentException(
      s"graft_pq: input vector has $n elements; codebook expects >= $dim (m*subDim)")

  /** Load a raw float/double array into a local normalized double[dim]:
    * cast-then-square ascending fold for the norm (normSq's exact
    * sequence), then one division per element. */
  private[plans] def loadNormalized(arr: ArrayData, dim: Int,
      isFloat: Boolean): Array[Double] = {
    checkDim(arr.numElements(), dim)
    val v = new Array[Double](dim)
    var i = 0
    var nsq = 0.0
    while (i < dim) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      v(i) = x
      nsq += x * x
      i += 1
    }
    val n = math.sqrt(nsq)
    i = 0
    while (i < dim) { v(i) = v(i) / n; i += 1 }
    v
  }
}

case class PqCodesExpr(child: Expression, cb: Array[Double],
    m: Int, subDim: Int, kCw: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (m >= 1 && subDim >= 1 && kCw >= 1 && cb.length == kCw * m * subDim)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_pq_codes: need m,subDim,kCw >= 1 and |cb| = kCw*m*subDim, " +
          s"got ($m, $subDim, $kCw, |cb|=${cb.length})")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_codes requires array<float> or array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val dim = m * subDim
    val v = PqExprs.loadNormalized(input.asInstanceOf[ArrayData], dim, isFloat)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var cw = 0
      while (cw < kCw) {
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = v(s * subDim + i) - cb(cw * dim + s * subDim + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = cw }
        cw += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val cw = ctx.freshName("cw")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val v = ctx.freshName("v")
      val nsq = ctx.freshName("nsq"); val nrm = ctx.freshName("nrm")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val out = ctx.freshName("out")
      val dim = m * subDim
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |graft.plans.PqExprs.checkDim($a.numElements(), $dim);
         |double[] $v = new double[$dim];
         |double $nsq = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  $v[$i] = $get;
         |  $nsq += $v[$i] * $v[$i];
         |}
         |double $nrm = Math.sqrt($nsq);
         |for (int $i = 0; $i < $dim; $i++) { $v[$i] = $v[$i] / $nrm; }
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $cw = 0; $cw < $kCw; $cw++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $d = $v[$s * $subDim + $i] - $cbRef[$cw * $dim + $s * $subDim + $i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $cw; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // A case class with an Array[Double] field compares the codebook by
  // REFERENCE, so two structurally-identical instances (e.g. the codes
  // column rebuilt on both branches of a self-join) never canonicalize
  // equal and Catalyst CSE re-encodes per branch. Compare and hash the
  // codebook by CONTENT.
  override def equals(other: Any): Boolean = other match {
    case p: PqCodesExpr =>
      p.m == m && p.subDim == subDim && p.kCw == kCw &&
        p.child == child && java.util.Arrays.equals(p.cb, cb)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(m), Integer.valueOf(subDim),
    Integer.valueOf(kCw), Integer.valueOf(java.util.Arrays.hashCode(cb)))
}

/** Query-side ADC lookup table: out[s·kCw + cw] = L2²(sub_s(x̂), cw).
  * Same normalization, determinism contract, and preconditions as
  * [[PqCodesExpr]]. */
case class PqDistTableExpr(child: Expression, cb: Array[Double],
    m: Int, subDim: Int, kCw: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (m >= 1 && subDim >= 1 && kCw >= 1 && cb.length == kCw * m * subDim)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_pq_dists: need m,subDim,kCw >= 1 and |cb| = kCw*m*subDim, " +
          s"got ($m, $subDim, $kCw, |cb|=${cb.length})")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_dists requires array<float> or array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_dists"

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val dim = m * subDim
    val v = PqExprs.loadNormalized(input.asInstanceOf[ArrayData], dim, isFloat)
    val out = new Array[Double](m * kCw)
    var s = 0
    while (s < m) {
      var cw = 0
      while (cw < kCw) {
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = v(s * subDim + i) - cb(cw * dim + s * subDim + i)
          acc += d * d
          i += 1
        }
        out(s * kCw + cw) = acc
        cw += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val cw = ctx.freshName("cw")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val v = ctx.freshName("v")
      val nsq = ctx.freshName("nsq"); val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val dim = m * subDim
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |graft.plans.PqExprs.checkDim($a.numElements(), $dim);
         |double[] $v = new double[$dim];
         |double $nsq = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  $v[$i] = $get;
         |  $nsq += $v[$i] * $v[$i];
         |}
         |double $nrm = Math.sqrt($nsq);
         |for (int $i = 0; $i < $dim; $i++) { $v[$i] = $v[$i] / $nrm; }
         |double[] $out = new double[${m * kCw}];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $cw = 0; $cw < $kCw; $cw++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $d = $v[$s * $subDim + $i] - $cbRef[$cw * $dim + $s * $subDim + $i];
         |      $acc += $d * $d;
         |    }
         |    $out[$s * $kCw + $cw] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // content-based codebook equality — see PqCodesExpr.equals
  override def equals(other: Any): Boolean = other match {
    case p: PqDistTableExpr =>
      p.m == m && p.subDim == subDim && p.kCw == kCw &&
        p.child == child && java.util.Arrays.equals(p.cb, cb)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child, Integer.valueOf(m), Integer.valueOf(subDim),
    Integer.valueOf(kCw), Integer.valueOf(java.util.Arrays.hashCode(cb)))
}

/** ADC sum: Σ_s table[s·kCw + codes[s]], ascending s (the composed
  * form's fixed d0+d1+...+d{M-1} association). */
case class PqAdcExpr(left: Expression, right: Expression, kCw: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) if kCw >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires (array<int> codes, array<double> table), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(codesAny: Any, tableAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val table = tableAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    PqExprs.checkDim(table.numElements(), m * kCw)
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += table.getDouble(s * kCw + codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      s"""
         |int $m = $c.numElements();
         |graft.plans.PqExprs.checkDim($t.numElements(), $m * $kCw);
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $t.getDouble($s * $kCw + $c.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
