// Scratch main for round-local measurements (not part of the library
// surface). Current form: steady-state multi-pass timing of a few
// representative queries at sf0.1 with GC deltas — the tool that
// root-caused the r5 ScaleStressSpec flake (isolated q3 ×8 passes
// swing 2.5 → 27 → 2.5 s with flat GC: box contention from the
// periodic driver jobs, not a plan or memory problem; fixed by
// min-of-2 timing in the spec, mirroring Bench).
package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
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
    // round-7 probe: dedup_clusters cost split — pair build vs CC rounds.
    // Untimed warmup first (janino codegen + cold parquet page cache are
    // seconds for these pipelines and would pollute pass 1's split).
    graft.ops.DedupOps.dedupMinhash(spark, sf1).count()
    graft.ops.DedupOps.dedupClusters(spark, sf1).count()
    (1 to 3).foreach { i =>
      time(s"dedup_minhash pass $i") {
        graft.ops.DedupOps.dedupMinhash(spark, sf1).count()
      }
    }
    (1 to 3).foreach { i =>
      time(s"dedup_clusters pass $i") {
        graft.ops.DedupOps.dedupClusters(spark, sf1).count()
      }
    }
    println(s"[probe] gc total ${gcMs} ms")
    spark.stop()
  }
}
