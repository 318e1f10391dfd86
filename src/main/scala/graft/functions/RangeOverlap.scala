package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/** Closed-interval overlap predicate `[s1,e1] ∩ [s2,e2] ≠ ∅`
  * (⇔ s1 ≤ e2 ∧ s2 ≤ e1) over epoch-integer bounds — the DECLARED
  * form of an interval join: users write
  * `a.join(b, range_overlap(s1, e1, s2, e2, binWidth))` and
  * [[graft.plans.RewriteRangeOverlapJoin]] plans it as a binned
  * equi-join. `binWidth` is planning metadata (the bin size the
  * rewrite explodes intervals into — pick ~ the median interval
  * length); the predicate's SEMANTICS ignore it, so if the rule is
  * not installed the expression still evaluates correctly inside
  * whatever join Spark falls back to (a nested-loop) — graceful
  * degradation, identical results.
  */
case class RangeOverlap(
    s1: Expression, e1: Expression, s2: Expression, e2: Expression,
    binWidth: Long)
  extends Expression with Predicate {

  require(binWidth > 0, s"binWidth must be positive, got $binWidth")

  override def children: Seq[Expression] = Seq(s1, e1, s2, e2)
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"range_overlap expects 4 BIGINT bounds, got ${children.map(_.dataType.catalogString)}")

  override def eval(input: InternalRow): Any = {
    val a = s1.eval(input); val b = e1.eval(input)
    val c = s2.eval(input); val d = e2.eval(input)
    if (a == null || b == null || c == null || d == null) null
    else java.lang.Boolean.valueOf(
      a.asInstanceOf[Long] <= d.asInstanceOf[Long] &&
        c.asInstanceOf[Long] <= b.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = s1.genCode(ctx); val b = e1.genCode(ctx)
    val c = s2.genCode(ctx); val d = e2.genCode(ctx)
    ev.copy(code =
      code"""
        ${a.code}
        ${b.code}
        ${c.code}
        ${d.code}
        boolean ${ev.isNull} = ${a.isNull} || ${b.isNull} || ${c.isNull} || ${d.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = ${a.value} <= ${d.value} && ${c.value} <= ${b.value};
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RangeOverlap =
    copy(s1 = newChildren(0), e1 = newChildren(1),
      s2 = newChildren(2), e2 = newChildren(3))

  override def prettyName: String = "range_overlap"
}

object RangeOverlap {
  /** Column API: interval-overlap join predicate with a planning bin
    * width (same unit as the bounds). */
  def range_overlap(s1: Column, e1: Column, s2: Column, e2: Column,
      binWidth: Long): Column =
    Bridge.toColumn(RangeOverlap(
      Bridge.toExpression(s1), Bridge.toExpression(e1),
      Bridge.toExpression(s2), Bridge.toExpression(e2), binWidth))
}
