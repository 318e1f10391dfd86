package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** The JDBC (embedded Derby) ingest path: values survive the round
  * trip, the read is range-partitioned (parallel), and filters reach
  * the remote WHERE clause. */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("Derby round-trip preserves orders (timestamps as epoch micros)") {
    val back = JdbcSource.readOrders(spark, sf)
      .select(col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_ORDERSTATUS").as("o_orderstatus"),
        col("O_TOTALPRICE").as("o_totalprice"),
        col("O_ORDERDATE").as("o_orderdate"),
        col("O_ORDERPRIORITY").as("o_orderpriority"))
    val expected = Tables.orders(spark, sf)
      .withColumn("o_orderdate", unix_micros(col("o_orderdate").cast("timestamp")))
      .select(back.columns.map(col).toSeq: _*)
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
  }

  test("read is range-partitioned: 8 bounded queries, not one funnel") {
    assert(JdbcSource.readOrders(spark, sf).rdd.getNumPartitions == 8)
  }

  test("filters push into the remote WHERE clause") {
    val filtered = JdbcSource.readOrders(spark, sf)
      .filter(col("O_ORDERSTATUS") === "F")
    val desc = filtered.queryExecution.executedPlan.toString
    // `*` marks a filter the source handles fully (no Spark-side re-check)
    assert(desc.contains("*EqualTo(o_orderstatus,F)"),
      s"expected JDBC pushdown in plan:\n$desc")
  }
}
