package graft.tools

import org.apache.spark.sql.DataFrame

/** Physical-plan shape fingerprint for regression detection (r4
  * verdict item #8): counts of the plan nodes that embody each
  * query's scale design — exchanges (shuffles), broadcast vs
  * sort-merge vs hash joins, TakeOrdered vs global Sort, scans,
  * generates, windows, aggregate flavors. A silent optimizer
  * regression (a broadcast degrading to SMJ, an extra shuffle, a
  * pushed filter reappearing as a post-scan sort) changes the
  * fingerprint and fails PlanFingerprintSpec loudly — the automated
  * version of the one-off plan audits that caught the explode-filter
  * recompute trap.
  *
  * Computed on the prepared-but-unexecuted physical plan (inside the
  * AdaptiveSparkPlan wrapper when AQE is on): exchanges ARE present
  * (EnsureRequirements has run — `sparkPlan` would show none), but
  * runtime re-planning hasn't happened, so the fingerprint is
  * deterministic for a given code version + data layout.
  */
object PlanFingerprint {

  private val Interesting = Set(
    "ShuffleExchangeExec", "BroadcastExchangeExec",
    "SortMergeJoinExec", "BroadcastHashJoinExec", "ShuffledHashJoinExec",
    "BroadcastNestedLoopJoinExec", "CartesianProductExec",
    "TakeOrderedAndProjectExec", "SortExec",
    "FileSourceScanExec", "GenerateExec", "WindowExec",
    "HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec")

  def of(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // the initial plan until the query actually runs
      case p => p
    }
    val names = plan.collect {
      case n if Interesting(n.getClass.getSimpleName) =>
        n.getClass.getSimpleName.stripSuffix("Exec")
    }
    names.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${v.size}" }.mkString(",")
  }
}
