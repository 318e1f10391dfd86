package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType
import graft.functions.RangeOverlap

/** Plans an interval join written as
  * `a.join(b, range_overlap(s1, e1, s2, e2, W) && …)` — an
  * inequality-only condition Spark would otherwise execute as a
  * nested-loop over the full cross product — as the binned
  * equi-join: each side explodes to the W-wide bins its interval
  * spans, candidates meet on bin equality (an ordinary shuffled
  * equi-join), and a residual filter applies the EXACT overlap
  * predicate plus the one-canonical-bin condition
  * `bin = max(s1 div W, s2 div W)` (the first bin the two intervals
  * share), so each overlapping pair survives EXACTLY once — bag
  * semantics identical to the naive join, no distinct needed.
  *
  * Drop-in safety: the [[RangeOverlap]] predicate itself is kept in
  * the residual filter, null bounds produce a null bin sequence and
  * are dropped by the non-outer Generate (the naive join drops them
  * too), and other conjuncts of the original condition move into the
  * residual filter unchanged. The rule only fires on INNER joins
  * whose RangeOverlap bounds split cleanly one-interval-per-side;
  * anything else is left for Spark's default planning.
  *
  * Scale: this turns O(|A|·|B|) nested-loop work into
  * O(Σ bins) shuffle + per-bin products — the standard distributed
  * interval-join rewrite, with skewed bins handled by AQE like any
  * other shuffled join.
  */
object RewriteRangeOverlapJoin extends Rule[LogicalPlan] {

  /** Reserved prefix of the attributes this rule generates. Doubles as
    * the idempotency marker: in a fixed-point batch shared with
    * PushDownPredicates (the `injectOptimizerRule` path), the
    * rewrite's residual Filter — which still contains the RangeOverlap
    * predicate — gets pushed back into the bin equi-join's condition,
    * and without a guard the rule would re-fire on its own output
    * every iteration until the Optimizer aborts on max-iterations.
    * A join whose inputs already expose `__graft_bin_*` attributes IS
    * that bin join (the top-level Project prunes them from the
    * rewrite's output, so no user-visible plan ever carries them), so
    * it must be left alone. */
  private val BinPrefix = "__graft_bin_"

  private def isBinJoin(left: LogicalPlan, right: LogicalPlan): Boolean =
    (left.outputSet ++ right.outputSet).exists(_.name.startsWith(BinPrefix))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) if !isBinJoin(left, right) =>
      val conjuncts = splitConjuncts(cond)
      val hit = conjuncts.collectFirst {
        case ro: RangeOverlap if orient(ro, left, right).isDefined =>
          ro -> orient(ro, left, right).get
      }
      hit match {
        case Some((ro, (ls, le, rs, re))) =>
          rewrite(left, right, ls, le, rs, re, ro,
            conjuncts.filterNot(_ eq ro))
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Bounds oriented as (leftStart, leftEnd, rightStart, rightEnd),
    * or None if they don't split one-interval-per-side. */
  private def orient(ro: RangeOverlap, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    def onSide(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet) && e.deterministic
    if (onSide(ro.s1, left) && onSide(ro.e1, left) &&
        onSide(ro.s2, right) && onSide(ro.e2, right))
      Some((ro.s1, ro.e1, ro.s2, ro.e2))
    else if (onSide(ro.s2, left) && onSide(ro.e2, left) &&
        onSide(ro.s1, right) && onSide(ro.e1, right))
      Some((ro.s2, ro.e2, ro.s1, ro.e1))
    else None
  }

  private def rewrite(
      left: LogicalPlan, right: LogicalPlan,
      ls: Expression, le: Expression, rs: Expression, re: Expression,
      ro: RangeOverlap, residual: Seq[Expression]): LogicalPlan = {
    val w = Literal(ro.binWidth, LongType)
    def binStart(s: Expression) = IntegralDivide(s, w)
    // no explicit step: Sequence infers +1 for start <= stop (always,
    // for true intervals) instead of throwing on degenerate input.
    // Sequence is TimeZoneAware — it must carry the session TZ or the
    // constructed plan is unresolved.
    def binsOf(s: Expression, e: Expression) =
      new Sequence(binStart(s), binStart(e), None, Some(conf.sessionLocalTimeZone))

    val binL = AttributeReference(BinPrefix + "l", LongType, nullable = false)()
    val binR = AttributeReference(BinPrefix + "r", LongType, nullable = false)()
    val genL = Generate(Explode(binsOf(ls, le)), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binL), child = left)
    val genR = Generate(Explode(binsOf(rs, re)), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binR), child = right)
    val joined = Join(genL, genR, Inner, Some(EqualTo(binL, binR)), JoinHint.NONE)
    val canonical = EqualTo(binL, Greatest(Seq(binStart(ls), binStart(rs))))
    val full = (Seq(ro, canonical) ++ residual).reduce(And(_, _))
    Project(left.output ++ right.output, Filter(full, joined))
  }
}

/** Imperative installation on a live session (idempotent) — the
  * extraOptimizations hook, for sessions not built with
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftPlans {
  def install(spark: SparkSession): Unit = synchronized {
    val em = spark.experimental
    if (!em.extraOptimizations.exists(_ eq RewriteRangeOverlapJoin))
      em.extraOptimizations = em.extraOptimizations :+ RewriteRangeOverlapJoin
  }
}
