package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark sessions are
  * expensive; suites run sequentially under sbt's default). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    // unique warehouse per JVM: managed-table tests (bucketing) would
    // otherwise trip over LOCATION_ALREADY_EXISTS across runs, since
    // the in-memory catalog forgets tables but the directory persists
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
