package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark sessions are
  * expensive; suites run sequentially under sbt's default). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
