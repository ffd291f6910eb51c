package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The KMV and Count-Min sketches as ENGINE PRIMITIVES — first-class
  * Catalyst aggregate functions (round-12 VERDICT directive 2).
  *
  * q44/q45/st20 proved the sketch *semantics* (merge associative/
  * commutative/idempotent, estimator error measured) but built every
  * sketch as a per-query Window + WindowGroupLimit / explode + pivot
  * construction. These [[TypedImperativeAggregate]]s make the sketch a
  * reusable aggregate: `graft_kmv_sketch(h, id)` / `graft_cm_sketch
  * (key, weight)` compose with any GROUP BY, and Spark's partial
  * aggregation IS the summary merge — each task reduces its input to
  * one small buffer before the exchange, so the shuffle carries
  * ≤ |groups|·k sketch entries per task (KMV) or d·w longs per task
  * (CM) instead of rows. At 1000 executors that is exactly the
  * mergeable-summary contract the per-query constructions simulated.
  *
  * Both aggregates replay the SAME portable hashes as the composed
  * forms (KmvSeed/permA/permB over P = 2^31−1), so the re-expressed
  * q44/q46/st20 gate against their UNCHANGED DuckDB oracles — the
  * primitive must not change a single reported value.
  */
object SketchAggs {
  /** Bottom-k sketch of (h, id) pairs as a Column aggregate. Output:
    * array<struct<h:long, id:long>> sorted by (h, id) ascending,
    * length min(k, distinct pairs) — `size(...)` is q44's n_sk,
    * `element_at(..., k).h` its hk. */
  def kmvSketch(h: Column, id: Column, k: Int): Column =
    GraftSqlBridge.columnOf(KmvSketchAgg(
      GraftSqlBridge.expression(h), GraftSqlBridge.expression(id), k)
      .toAggregateExpression())

  /** Count-Min counter matrix as a Column aggregate. Output:
    * array<long> of d·w cells, cell[j·w + pos_j(key)] summing weight —
    * an item's estimate is the min over its d cells. */
  def cmSketch(key: Column, weight: Column, d: Int, w: Int): Column =
    GraftSqlBridge.columnOf(CmSketchAgg(
      GraftSqlBridge.expression(key), GraftSqlBridge.expression(weight), d, w)
      .toAggregateExpression())

  private[plans] def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Fixed-width binned counter array as a Column aggregate — the
    * FOURTH mergeable summary as an engine primitive (KMV distinct,
    * CM frequency, bloom membership, THIS = quantiles via st19's
    * fixed-bin histogram). `bin` must already be clamped to [0, b)
    * by the caller (the binning rule is the operator's semantics, not
    * the sketch's); an out-of-range bin throws rather than silently
    * corrupting a neighbor cell. Output: array<long> of b counters. */
  def binnedCounts(bin: Column, weight: Column, b: Int): Column =
    GraftSqlBridge.columnOf(BinnedCountsAgg(
      GraftSqlBridge.expression(bin), GraftSqlBridge.expression(weight), b)
      .toAggregateExpression())

  /** The d row-hash positions of `key` in a d×w Count-Min sketch —
    * the lookup side of [[cmSketch]], same permA/permB row hashes.
    * Returns the flattened cell indices (j·w + pos_j). */
  def cmPositions(key: Column, d: Int, w: Int): Seq[Column] = {
    import org.apache.spark.sql.functions._
    val P = graft.functions.TextFunctions.P
    (0 until d).map { j =>
      lit(j * w) +
        pmod(pmod(key, lit(P)) * graft.functions.TextFunctions.permA(j) +
          graft.functions.TextFunctions.permB(j), lit(P)) % w
    }
  }
}

/** Bounded bottom-k set of (h, id) pairs, ordered by (h, id). Insert
  * dedupes exact pairs (h is a function of id for every caller, so
  * pair-dedup == id-dedup) — re-aggregating exploded sketches is
  * therefore IDEMPOTENT, the property st20's slicing-invariance gate
  * relies on. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[(Long, Long)](
    new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
  def insert(h: Long, id: Long): Unit = {
    set.add((h, id))
    if (set.size > k) set.pollLast()
  }
}

/** KMV bottom-k aggregate — see [[SketchAggs.kmvSketch]]. Null h or id
  * rows are skipped (the composed form's distinct/hash pipeline never
  * produces them; skipping matches aggregate-ignores-null SQL norms).
  *
  * Reference semantics: main.py:390-487's pipeline has no sketch
  * layer; this primitive backs the q44/q45/st20 family documented in
  * SURVEY §2. */
case class KmvSketchAgg(
    hExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(hExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    (hExpr.dataType, idExpr.dataType) match {
      case (ht, it) if SketchAggs.integral(ht) && SketchAggs.integral(it) && k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (ht, it) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_sketch requires integral (h, id) and k >= 1, " +
          s"got (${ht.simpleString}, ${it.simpleString}, k=$k)")
    }

  private def longOf(e: Expression, v: Any): Long = e.dataType match {
    case LongType => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val hv = hExpr.eval(input)
    val iv = idExpr.eval(input)
    if (hv != null && iv != null) buf.insert(longOf(hExpr, hv), longOf(idExpr, iv))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) { val p = it.next(); buf.insert(p._1, p._2) }
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = InternalRow(p._1, p._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.set.size * 16)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(hExpr = newChildren(0), idExpr = newChildren(1))
}

/** Count-Min d×w counter matrix aggregate — see
  * [[SketchAggs.cmSketch]]. Row hashes are the minhash permutation
  * family over P = 2^31−1 (q46's posJ, bit for bit), so estimates from
  * this sketch hash-match the composed q46 oracle. Null keys/weights
  * are skipped. */
case class CmSketchAgg(
    keyExpr: Expression, weightExpr: Expression, d: Int, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(keyExpr, weightExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cm_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    (keyExpr.dataType, weightExpr.dataType) match {
      case (kt, wt) if SketchAggs.integral(kt) && SketchAggs.integral(wt) && d >= 1 && w >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (kt, wt) => TypeCheckResult.TypeCheckFailure(
        s"graft_cm_sketch requires integral (key, weight) and d,w >= 1, " +
          s"got (${kt.simpleString}, ${wt.simpleString}, d=$d, w=$w)")
    }

  private val P = graft.functions.TextFunctions.P
  private val as: Array[Long] = (0 until d)
    .map(j => graft.functions.TextFunctions.permA(j)).toArray
  private val bs: Array[Long] = (0 until d)
    .map(j => graft.functions.TextFunctions.permB(j)).toArray

  private def longOf(e: Expression, v: Any): Long = e.dataType match {
    case LongType => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val kv = keyExpr.eval(input)
    val wv = weightExpr.eval(input)
    if (kv != null && wv != null) {
      val key = longOf(keyExpr, kv)
      val wt = longOf(weightExpr, wv)
      var j = 0
      while (j < d) {
        // non-negative keys: % == pmod (q44/q46's contract); the
        // Math.floorMod guards a negative key rather than corrupting
        val pos = Math.floorMod(Math.floorMod(key, P) * as(j) + bs(j), P) % w
        buf(j * w + pos.toInt) += wt
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmSketchAgg =
    copy(keyExpr = newChildren(0), weightExpr = newChildren(1))
}

/** Binned counter-array aggregate — see [[SketchAggs.binnedCounts]].
  * CmSketchAgg's buffer/merge/serialize contract with the identity
  * positioning (no hashing: the bin IS the cell). Null bin or weight
  * rows are skipped; an out-of-range bin fails loudly. */
case class BinnedCountsAgg(
    binExpr: Expression, weightExpr: Expression, b: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(binExpr, weightExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_binned_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    (binExpr.dataType, weightExpr.dataType) match {
      case (bt, wt) if SketchAggs.integral(bt) && SketchAggs.integral(wt) && b >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (bt, wt) => TypeCheckResult.TypeCheckFailure(
        s"graft_binned_counts requires integral (bin, weight) and b >= 1, " +
          s"got (${bt.simpleString}, ${wt.simpleString}, b=$b)")
    }

  private def longOf(e: Expression, v: Any): Long = e.dataType match {
    case LongType => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](b)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val bv = binExpr.eval(input)
    val wv = weightExpr.eval(input)
    if (bv != null && wv != null) {
      val bin = longOf(binExpr, bv)
      if (bin < 0 || bin >= b) throw new IllegalArgumentException(
        s"graft_binned_counts: bin $bin outside [0, $b) — clamp upstream")
      buf(bin.toInt) += longOf(weightExpr, wv)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BinnedCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BinnedCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BinnedCountsAgg =
    copy(binExpr = newChildren(0), weightExpr = newChildren(1))
}
