// Scratch main to bisect the cold-start cost of distinct_tokens.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.OpsUtil._

object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    time("raw count")(docs.count())
    time("split only")(docs.select(split(lower(col("text")), "\\s+").as("tk")).count())
    time("split+filter HOF")(docs.select(tokens(col("text")).as("tk")).count())
    time("explode")(docs.select(explode(tokens(col("text"))).as("w")).count())
    time("explode+groupBy word")(docs.select(explode(tokens(col("text"))).as("w")).groupBy("w").count().count())
    time("explode+distinct lang,word")(docs.select(col("lang"), explode(tokens(col("text"))).as("w")).distinct().count())
    time("with orderBy")(docs.select(col("lang"), explode(tokens(col("text"))).as("w")).distinct().orderBy("lang", "w").count())
    time("2nd run full")(docs.select(col("lang"), explode(tokens(col("text"))).as("w")).distinct().orderBy("lang", "w").count())
    spark.stop()
  }
}
