// Scratch main for round-local measurements (not part of the library
// surface). Currently: margin of the agg_approx within-bound flags
// (how far the sketches sit from the 10%/5% thresholds — a borderline
// flag would make the driver hash flaky) and wall time of the two most
// expensive bench queries.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val m = graft.Tables.orders(spark, sf)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("exact_c"),
          approx_count_distinct(col("o_custkey")).as("hll"),
          expr("percentile(o_totalprice, 0.5)").as("exact_m"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("amed"))
        .select(col("o_orderpriority"),
          (abs(col("hll") - col("exact_c")).cast("double") / col("exact_c")).as("hll_rel"),
          (abs(col("amed") - col("exact_m")) / col("exact_m")).as("med_rel"))
        .collect()
      println(s"[probe] $sf sketch rel-errors (bounds .15/.05):")
      m.foreach(r => println(f"[probe]   ${r.getString(0)}%-16s hll=${r.getDouble(1)}%.4f med=${r.getDouble(2)}%.5f"))
    }
    val sf1 = "/root/testdata/sf0.1"
    time("text_lang_ngram warm")(graft.ops.TextAnalysisOps.langIdNgram(spark, sf1).count())
    time("text_lang_ngram")(graft.ops.TextAnalysisOps.langIdNgram(spark, sf1).count())
    time("dedup_clusters warm")(graft.ops.DedupOps.dedupClusters(spark, sf1).count())
    time("dedup_clusters")(graft.ops.DedupOps.dedupClusters(spark, sf1).count())
    time("dedup_minhash")(graft.ops.DedupOps.dedupMinhash(spark, sf1).count())
    spark.stop()
  }
}
