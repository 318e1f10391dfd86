package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The bench must not lie (r3 verdict item 2): a crashing query is an
  * explicit error entry, never a timing. */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a deliberately-broken query records an error, not a timing") {
    val qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "ok"   -> ((s, _) => s.range(10).toDF()),
      "boom" -> ((_, _) => throw new RuntimeException("injected bench failure")))
    val r = Bench.timedPass(spark, qs, "/unused")
    assert(r("ok").err.isEmpty)
    assert(r("ok").sec >= 0)
    assert(r("boom").err.exists(_.contains("injected bench failure")))
  }

  test("a query that fails during the Spark action (not construction) is also caught") {
    val qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "lazy_boom" -> ((s, _) =>
        s.range(4).toDF("n").filter(org.apache.spark.sql.functions
          .udf((n: Long) => { require(n < 2, s"task-side failure at $n"); true })
          .apply(org.apache.spark.sql.functions.col("n")))))
    val r = Bench.timedPass(spark, qs, "/unused")
    assert(r("lazy_boom").err.isDefined)
  }

  test("error messages survive JSON escaping") {
    val s = Bench.jsonEscape("a \"quoted\"\nmulti\tline \\ message")
    assert(!s.contains("\n") && !s.contains("\t"))
    assert(s.contains("\\\"quoted\\\""))
  }
}
