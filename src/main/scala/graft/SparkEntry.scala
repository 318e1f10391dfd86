package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator appears twice: a Spark implementation in
  * `queries` and a DuckDB-equivalent SQL in `oracleSql` with IDENTICAL
  * output column names (the driver sorts columns by name before
  * hashing). Non-SQL-expressible ops omit the oracle entry (driver
  * falls back to a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference workloads re-expressed (SURVEY.md §2.2)
    "word_count"      -> (TextOps.wordCount _),
    "grep"            -> (TextOps.grep _),
    "distinct_tokens" -> (TextOps.distinctTokens _),
    // Relational surface (SURVEY.md §2.3 EXT)
    "q1_pricing"        -> (RelationalOps.q1Pricing _),
    "q3_top_revenue"    -> (RelationalOps.q3TopRevenue _),
    "q5_region_revenue" -> (RelationalOps.q5RegionRevenue _),
    "join_semi"         -> (RelationalOps.semiJoinCustomers _),
    "join_anti"         -> (RelationalOps.antiJoinCustomers _),
    "join_outer_stats"  -> (RelationalOps.outerJoinOrderStats _),
    "agg_stats"         -> (RelationalOps.aggStatsByPriority _),
    "monthly_orders"    -> (RelationalOps.monthlyOrders _),
    "top_orders"        -> (RelationalOps.topOrders _),
    "set_ops"           -> (RelationalOps.setOpsSegments _),
    "rollup_revenue"    -> (RelationalOps.rollupRevenue _),
    "window_order_rank" -> (RelationalOps.windowOrderRank _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "word_count"        -> TextOps.wordCountSql,
    "grep"              -> TextOps.grepSql,
    "distinct_tokens"   -> TextOps.distinctTokensSql,
    "q1_pricing"        -> RelationalOps.q1PricingSql,
    "q3_top_revenue"    -> RelationalOps.q3TopRevenueSql,
    "q5_region_revenue" -> RelationalOps.q5RegionRevenueSql,
    "join_semi"         -> RelationalOps.semiJoinCustomersSql,
    "join_anti"         -> RelationalOps.antiJoinCustomersSql,
    "join_outer_stats"  -> RelationalOps.outerJoinOrderStatsSql,
    "agg_stats"         -> RelationalOps.aggStatsByPrioritySql,
    "monthly_orders"    -> RelationalOps.monthlyOrdersSql,
    "top_orders"        -> RelationalOps.topOrdersSql,
    "set_ops"           -> RelationalOps.setOpsSegmentsSql,
    "rollup_revenue"    -> RelationalOps.rollupRevenueSql,
    "window_order_rank" -> RelationalOps.windowOrderRankSql,
  )
}
