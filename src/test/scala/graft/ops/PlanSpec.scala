package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Plan-shape regression guards: the scale properties the operators
  * are designed around (predicate pushdown, column pruning, broadcast
  * dimensions, top-k without global sort) asserted on actual plans so
  * a refactor can't silently regress them. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // AQE hides children
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s }
  }

  test("q1_pricing pushes the shipdate filter to the parquet scan") {
    val meta = scans(RelationalOps.q1Pricing(spark, sf)).head.metadata
    assert(meta("PushedFilters").contains("LessThanOrEqual(l_shipdate"))
  }

  test("q1_pricing prunes to the 7 referenced columns") {
    val schema = scans(RelationalOps.q1Pricing(spark, sf)).head.schema
    assert(schema.size === 7, schema.fieldNames.mkString(","))
  }

  test("join_semi pushes the status equality predicate to the orders scan") {
    val pushed = scans(RelationalOps.semiJoinCustomers(spark, sf))
      .map(_.metadata("PushedFilters"))
    assert(pushed.exists(_.contains("EqualTo(o_orderstatus,O)")), pushed)
  }

  test("grep's case-insensitive contains stays post-scan (lower() is not pushable)") {
    // documents the tradeoff: reference semantics are case-insensitive
    // (grep_map.py lowercases), and lower(text) blocks parquet
    // pushdown — the filter must run post-scan. If data were known
    // lowercase, dropping lower() would enable StringContains pushdown.
    val meta = scans(TextOps.grep(spark, sf)).head.metadata
    assert(!meta("PushedFilters").contains("StringContains"))
  }

  test("q5 snowflake joins broadcast all three dimensions") {
    val df = RelationalOps.q5RegionRevenue(spark, sf)
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
    assert(broadcasts.size >= 3, s"expected >=3 broadcasts\n$plan")
  }

  test("top_orders plans as TakeOrderedAndProject (no global sort)") {
    val plan = RelationalOps.topOrders(spark, sf).queryExecution.executedPlan
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
  }
}
