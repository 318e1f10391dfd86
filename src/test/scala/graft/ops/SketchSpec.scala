package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Approximate operators bounded against exact answers (they have no
  * DuckDB oracle — sketch internals are engine-specific). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("sketch within-bound flags are all true (HLL 15%, median 5%)") {
    val rows = RelationalOps.approxSketches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_15pct"), s"group ${r.get(0)}: HLL out of bound")
      assert(r.getAs[Boolean]("median_within_5pct"), s"group ${r.get(0)}: median out of bound")
    }
  }

  test("exact_median column agrees with the percentiles query") {
    val exact = RelationalOps.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("median_price")).toMap
    RelationalOps.approxSketches(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("exact_median") === exact(r.getString(0)))
    }
  }

  test("IVF index round-trips through parquet: stored-index probe ≡ inline probe") {
    // build once / probe many: the centroid table written to storage
    // and read back must route queries identically to the fresh build
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
    SimilarityOps.annIvfCentroids(spark, sf).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val fromStored = SimilarityOps.annIvfProbe(spark, sf, stored).collect().toSeq
    val inline = SimilarityOps.annIvf(spark, sf).collect().toSeq
    assert(fromStored === inline)
  }

  test("IVF ANN recall@3 vs brute force is useful") {
    val brute = SimilarityOps.bruteTopK(spark, sf)
      .where(org.apache.spark.sql.functions.col("rank") <= 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.annIvf(spark, sf)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall $recall")
  }
}
