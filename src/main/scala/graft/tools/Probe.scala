// Scratch main for round-local measurements (not part of the library
// surface). Currently: steady-state wall time of dedup_minhash at
// sf0.1 (BENCH_r04 1.39 s → r5 bench passes show 1.65-2.06 s after
// the single-tokenize + lazy-checkpoint rework; is the delta JIT/
// ordering noise like agg_corr in r4, or structural?), plus
// dedup_clusters for context.
package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf1 = "/root/testdata/sf0.1"
    // warm codegen/JIT on the small SF like Bench does
    graft.ops.DedupOps.dedupMinhash(spark, "/root/testdata/sf0.001").count()
    for (i <- 1 to 6)
      time(s"dedup_minhash pass $i")(graft.ops.DedupOps.dedupMinhash(spark, sf1).count())
    spark.stop()
  }
}
