package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-accurate BPE token counting at REAL merges-table size
  * (round-12 VERDICT directive 7). The composed HOF form
  * (TextOps.bpeTokenCountComposed) unrolls one interpreted
  * `aggregate(...)` lambda per merge rule into the expression tree —
  * exact, oracle-replayable, and measured fine at 25 rules, but a
  * published tokenizer ships 32k-50k merges and the tree (and its
  * per-element interpreted evaluation) grows linearly with the table:
  * 250 rules was already ~50× the 25-rule wall (PLANS.md round-13
  * curve). Here the merges table is DATA, not expression structure:
  * one compiled loop per row applies the rules in rank order with the
  * IDENTICAL greedy left-to-right semantics (differential-spec'd
  * against the composed form, and the registered t22 runs THIS
  * expression against the unchanged DuckDB twin), with an O(1)
  * symbol-presence prune that skips the rules a word cannot fire.
  *
  * The merges ship inside the expression (broadcast-a-small-dim in
  * expression space — a 50k-rule table is ~1 MB); codebook-style
  * content equality keeps Catalyst CSE working (PqExprs' lesson). */
object BpeApply {
  /** Sequential greedy BPE token count of a space-tokenized text:
    * the compiled twin of the composed fold — split(' ', -1), per word
    * split('', -1) minus empties, one greedy left-to-right pass per
    * rule in rank order, sum of final symbol counts. */
  def countTokens(text: UTF8String, lefts: Array[String], rights: Array[String]): Long = {
    val words = text.toString.split(" ", -1)
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms = w.split("", -1).filter(_.nonEmpty)
        // prune: a rule (l, r) can only fire if BOTH symbols are
        // present; the set only grows with merged symbols
        val present = new java.util.HashSet[String]()
        var i = 0
        while (i < syms.length) { present.add(syms(i)); i += 1 }
        var ri = 0
        while (ri < lefts.length && syms.length > 1) {
          val l = lefts(ri); val r = rights(ri)
          if (present.contains(l) && present.contains(r)) {
            val out = new Array[String](syms.length)
            var n = 0
            var j = 0
            var fired = false
            while (j < syms.length) {
              val x = syms(j)
              if (n > 0 && out(n - 1) == l && x == r) {
                out(n - 1) = l + r
                fired = true
              } else { out(n) = x; n += 1 }
              j += 1
            }
            if (fired) {
              syms = java.util.Arrays.copyOf(out, n)
              present.add(l + r)
            }
          }
          ri += 1
        }
        total += syms.length
      }
      wi += 1
    }
    total
  }
}

case class BpeCountExpr(child: Expression,
    lefts: Array[String], rights: Array[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if lefts.length == rights.length =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count: ragged merges table (${lefts.length} lefts, ${rights.length} rights)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeApply.countTokens(input.asInstanceOf[UTF8String], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
    defineCodeGen(ctx, ev, t =>
      s"graft.plans.BpeApply.countTokens($t, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // content-based merges equality so two identically-parameterized
  // counters canonicalize equal (PqCodesExpr's CSE rationale)
  override def equals(other: Any): Boolean = other match {
    case b: BpeCountExpr => b.child == child &&
      java.util.Arrays.equals(b.lefts.asInstanceOf[Array[AnyRef]], lefts.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.equals(b.rights.asInstanceOf[Array[AnyRef]], rights.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(getClass, child,
    Integer.valueOf(java.util.Arrays.hashCode(lefts.asInstanceOf[Array[AnyRef]])),
    Integer.valueOf(java.util.Arrays.hashCode(rights.asInstanceOf[Array[AnyRef]])))
}
