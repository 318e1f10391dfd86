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

  // The cold-build pricing policy (r7 verdict item 5) depends on pass
  // order: within a timed pass (sorted name order) the cache BUILDER
  // must run before the queries that share its cache, otherwise the
  // cold build silently moves to a different query's headline. This
  // ordering is an accident of the query NAMES — guard it so a rename
  // can't flip which entry pays the cold build without failing a test.
  test("cache builders precede their sharers in sorted query-name order") {
    val names = SparkEntry.queries.keySet
    val couples = Seq( // builder -> sharer (same underlying cache)
      "dedup_semantic" -> "sim_ann_ivf", // IVF centroid cache
      "graph_pagerank" -> "graph_triangles") // minhash pair cache
    couples.foreach { case (builder, sharer) =>
      assert(names.contains(builder) && names.contains(sharer),
        s"cache-coupled queries renamed: $builder/$sharer no longer registered — " +
          "update Bench.cacheCoupled AND this guard together")
      assert(builder < sharer,
        s"'$builder' must sort before '$sharer': the bench prices the cold " +
          "cache build on the first coupled query per pass")
    }
  }

}
