package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** rec_als semantic pins on a crafted log-multiplicative matrix (the
  * sf tables exercise it at scale via OpsSmokeSpec + the DuckDB
  * oracle, which independently replays the whole training). */
class RecAlsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 2 users × 3 items with qty = round(e^(u·v) − 1), so the ln(1+qty)
    * ratings are near rank-1 — a structure rank-2 ALS must exploit. */
  private def fixture(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-als").toString
    val qty = Map(
      (1L, 1L) -> 2.0, (1L, 2L) -> 3.0, (1L, 3L) -> 6.0,
      (2L, 1L) -> 6.0, (2L, 2L) -> 19.0, (2L, 3L) -> 54.0)
    // one order per user; line k of order c buys part k
    qty.toSeq.map { case ((c, p), q) => (c, p, q) }
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 101L), (2L, 102L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("near-rank-1 ratings: trained rmse crushes the zero predictor") {
    val d = fixture()
    val row = RelationalOps.recAls(spark, d).collect().head
    assert(row.getLong(0) == 2 && row.getLong(1) == 3 && row.getLong(2) == 6)
    val rmse = row.getDouble(3)
    // zero-predictor rmse = sqrt(mean r²) ≈ 2.54 on this matrix; a
    // working rank-2 fit of a near-rank-1 log-matrix must beat half
    val rs = Seq(2.0, 3.0, 6.0, 6.0, 19.0, 54.0).map(q => math.log(1 + q))
    val zero = math.sqrt(rs.map(r => r * r).sum / rs.size)
    assert(!rmse.isNaN && rmse >= 0.0, s"rmse=$rmse")
    assert(rmse < zero / 2, s"rmse=$rmse vs zero-predictor $zero")
  }

  test("training is deterministic run-to-run") {
    val d = fixture()
    val a = RelationalOps.recAls(spark, d).collect().head
    val b = RelationalOps.recAls(spark, d).collect().head
    assert(a == b)
  }
}
