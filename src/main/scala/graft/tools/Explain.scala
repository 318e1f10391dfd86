// Plan inspection scratch main — run with:
//   sbt "runMain graft.tools.Explain <queryName> [sfDir]"
// Prints the formatted physical plan and (optionally) times the query.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(f"rows=$n2 warm time=${(System.nanoTime() - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
