package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Approximate operators bounded against exact answers (they have no
  * DuckDB oracle — sketch internals are engine-specific). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 10% of exact per group") {
    RelationalOps.approxSketches(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_customers").toDouble
      val exact = r.getAs[Long]("exact_customers").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"group ${r.get(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx median between group min and max, near exact median") {
    val exact = RelationalOps.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("median_price")).toMap
    RelationalOps.approxSketches(spark, sf).collect().foreach { r =>
      val am = r.getAs[Double]("approx_median")
      val em = exact(r.getString(0))
      assert(math.abs(am - em) / em <= 0.05, s"approx median $am vs exact $em")
    }
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
