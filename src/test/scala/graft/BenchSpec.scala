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

  // The driver stores only the last ~2000 chars of bench stdout and
  // parses the {"metric":...} line from that window: rounds 2-4
  // (50 queries) parsed, rounds 5-9 (62-97 queries, full-precision
  // line >2 KB) recorded parsed:null. The contract line is therefore
  // hard-capped; these tests pin the cap against the REAL registry so
  // query growth can never silently push it back over the window.
  test("compact contract line fits the driver's stdout-tail window") {
    // pessimistic: every registered query at a 3-digit-seconds cost
    val results = SparkEntry.queries.keySet.toSeq.sorted.map(_ -> 999.99)
    val line = Bench.compactLine(results, failedCount = 0,
      wallSec = 9999.9, ratio = 12.34, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1500, s"line is ${line.length} chars")
    val om = new com.fasterxml.jackson.databind.ObjectMapper
    val node = om.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(math.abs(node.get("value").asDouble - 999.99 * results.size) < 1.0)
    assert(node.get("n_queries").asInt == results.size)
    assert(node.get("n_shown").asInt <= results.size)
    // shown + other must account for the full total
    import scala.jdk.CollectionConverters._
    val shownSum = node.get("queries").properties.asScala
      .iterator.map(_.getValue.asDouble).sum
    assert(math.abs(shownSum + node.get("other_sec").asDouble
      - node.get("value").asDouble) < 1.0)
  }

  test("compact line caps even under adversarial registry growth") {
    val results = (1 to 500).map(i => s"pathologically_long_query_name_$i" -> i / 7.0)
    val line = Bench.compactLine(results, 3, 123.4, 1.5, "/root/testdata/sf0.1")
    assert(line.length <= 1500, s"line is ${line.length} chars")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("n_queries").asInt == 500)
    assert(node.get("n_shown").asInt < 500) // truncation declared, not hidden
    // the most expensive query is always shown
    assert(node.get("queries").has("pathologically_long_query_name_500"))
  }

  test("compact contract line is one single line at any budget (hard cap, not soft)") {
    // the advice-flagged pathology: trailing-zero trimming can render
    // other_sec LONGER than the total the reserve was sized with
    // (total 1000 → "1000" vs other 999.99 → "999.99"), so the cap
    // must be enforced on the ASSEMBLED line. Sweep budgets across a
    // 200-query map and demand length ≤ budget every time (down to the
    // degenerate zero-shown floor) and exactly one line.
    val results = (1 to 200).map(i => s"q_$i" -> (if (i == 1) 999.99 else 0.004))
    val floor = Bench.compactLine(results, 0, 1.0, 1.0, "/sf").length
    for (budget <- Seq(200, 300, 500, 800, 1100, 1500)) {
      val line = Bench.compactLine(results, 0, 1.0, 1.0, "/sf", budget = budget)
      assert(!line.contains("\n"), "contract line must be a single line")
      assert(line.length <= math.max(budget, floor),
        s"budget $budget overflowed: ${line.length} chars")
      // still parseable JSON with the full total, however hard the cut
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      assert(math.abs(node.get("value").asDouble - results.map(_._2).sum) < 1.0)
    }
  }

  test("a clean pass-2 run redeems a transient pass-1 error; a pass-2 error is fatal") {
    import Bench.Timing
    val ordered = Seq("flaky", "broken", "steady", "fast")
    val p1 = Map(
      "flaky"  -> Timing(0.01, Some("transient executor loss")),
      "broken" -> Timing(0.01, Some("real failure")),
      "steady" -> Timing(2.0, None),
      "fast"   -> Timing(0.2, None)) // under threshold: no rerun
    val p2 = Map(
      "flaky"  -> Timing(1.4, None), // clean rerun → redeemed
      "broken" -> Timing(0.01, Some("real failure")),
      "steady" -> Timing(1.8, None))
    val (results, errors) = Bench.mergePasses(ordered, p1, p2)
    assert(errors === Seq("broken" -> "real failure"),
      "only the query that failed its freshest run is an error")
    val r = results.toMap
    // redeemed: the one clean measurement, never min(garbage, clean)
    assert(r("flaky") === 1.4)
    assert(r("steady") === 1.8) // min-of-2
    assert(r("fast") === 0.2)   // pass-1 only
  }

  test("burst-window contention: a loud per-query window trips the flag a quiet run-average misses") {
    import Bench.Contention
    // the r14 shape: run-average external CPU well under the 1.5
    // floor, but one multi-second query saw 12 external cores
    val c = Contention(runAvgExt = Some(0.58), extMaxWin = Some(12.0),
      passRatio = Some(0.6))
    assert(c.flag(Some(0.58), cpuWallRatio = 2.57), "burst must trip the flag")
    // quiet box: all three signals under their floors → not contended
    val quiet = Contention(Some(0.9), Some(1.8), Some(0.56))
    assert(!quiet.flag(Some(0.9), 2.0))
    // pass-ratio guard alone: same-or-smaller pass-2 workload taking
    // 1.5x longer means the box changed under the run
    val flipped = Contention(Some(0.58), Some(2.0), Some(1.82))
    assert(flipped.flag(Some(0.58), 2.57), "pass ratio must trip the flag")
    // /proc/stat unreadable end-to-end → cpu/wall heuristic fallback
    val blind = Contention(None, None, None)
    assert(blind.flag(None, 1.0) && !blind.flag(None, 2.8))
  }

  test("a burst absorbed by min-of-2 does not trip the flag (chosen-window semantics)") {
    import Bench.Timing
    // the first r15 gate run: pass-2 burst inflates the query 5x at
    // 4.6 external cores, but the headline takes quiet pass 1 —
    // judging CHOSEN windows keeps the record trustworthy
    val p1 = Map("stream_cdc" -> Timing(2.7, None, extCores = Some(0.43)))
    val p2 = Map("stream_cdc" -> Timing(12.1, None, extCores = Some(4.61)))
    val chosen = Bench.chosenTimings(Seq("stream_cdc"), p1, p2).toMap
    assert(chosen("stream_cdc").sec === 2.7)
    assert(Bench.extMaxWindow(Seq(chosen)) === Some(0.43),
      "only the window behind the recorded number counts")
    // the same burst hitting the CHOSEN pass must still trip
    val swapped = Bench.chosenTimings(Seq("stream_cdc"), p2, p1).toMap
    assert(swapped("stream_cdc").sec === 2.7, "min still wins")
    assert(Bench.extMaxWindow(Seq(swapped)) === Some(0.43))
    val bothLoud = Map("q" -> Timing(5.0, None, extCores = Some(6.0)))
    assert(Bench.extMaxWindow(Seq(bothLoud)) === Some(6.0))
  }

  test("iowait window trips the flag the CPU signals are blind to (r15 item 1)") {
    import Bench.Contention
    // the r15 shape: rec_item_cosine 13.46 s with ~0 external CPU in
    // both windows — only disk pressure explains it; the iowait
    // window is the signal that finally sees it
    val diskThrash = Contention(Some(0.3), Some(1.1), Some(0.8),
      iowMaxWin = Some(14.0))
    assert(diskThrash.flag(Some(0.3), 2.6), "iowait window must trip the flag")
    // our own staging/checkpoint IO stays well under the floor
    val selfIo = Contention(Some(0.3), Some(1.1), Some(0.8), iowMaxWin = Some(1.2))
    assert(!selfIo.flag(Some(0.3), 2.6))
  }

  test("iowMaxWindow judges the same trustworthy windows as extMaxWindow") {
    import Bench.Timing
    val m = Map(
      "short" -> Timing(0.4, None, iowaitCores = Some(30.0)), // jiffy noise
      "boom"  -> Timing(9.0, Some("err"), iowaitCores = Some(25.0)),
      "long"  -> Timing(3.0, None, iowaitCores = Some(7.5)))
    assert(Bench.iowMaxWindow(Seq(m)) === Some(7.5))
    assert(Bench.iowMaxWindow(Seq(Map("q" -> Timing(3.0, None)))) === None)
  }

  test("stream headline is trigger-exec seconds; wall stays the fallback (r15 item 5)") {
    import Bench.Timing
    val t = Timing(7.06, None, streamExecSec = Some(5.18))
    assert(t.headlineSec === 5.18, "exec is the headline, not the trigger-wait wall")
    // a meter that measured nothing can never report a free query
    assert(Timing(7.06, None, streamExecSec = Some(0.0)).headlineSec === 7.06)
    assert(Timing(3.0, None).headlineSec === 3.0)
    // min-of-2 chooses by the headline metric: pass 1 has the worse
    // wall but the better exec — it must win
    val p1 = Map("stream_x" -> Timing(7.0, None, streamExecSec = Some(4.0)))
    val p2 = Map("stream_x" -> Timing(6.5, None, streamExecSec = Some(6.0)))
    val c = Bench.chosenTimings(Seq("stream_x"), p1, p2).toMap
    assert(c("stream_x").headlineSec === 4.0)
    val (results, _) = Bench.mergePasses(Seq("stream_x"), p1, p2)
    assert(results === Seq("stream_x" -> 4.0))
  }

  test("chosenTimings: redeem, fatal pass-2 error, min rule") {
    import Bench.Timing
    val p1 = Map(
      "flaky"  -> Timing(0.01, Some("boom")),
      "broken" -> Timing(3.0, None),
      "steady" -> Timing(2.0, None))
    val p2 = Map(
      "flaky"  -> Timing(1.4, None),
      "broken" -> Timing(0.01, Some("fresh failure")),
      "steady" -> Timing(2.5, None))
    val c = Bench.chosenTimings(Seq("flaky", "broken", "steady"), p1, p2).toMap
    assert(c("flaky").sec === 1.4 && c("flaky").err.isEmpty)
    assert(c("broken").err === Some("fresh failure"), "freshest run is authoritative")
    assert(c("steady").sec === 2.0, "min rule keeps pass 1")
  }

  test("extMaxWindow ignores short windows and errored queries") {
    import Bench.Timing
    val p1 = Map(
      "short" -> Timing(0.4, None, extCores = Some(30.0)),  // jiffy noise window
      "boom"  -> Timing(9.0, Some("err"), extCores = Some(25.0)),
      "long"  -> Timing(3.0, None, extCores = Some(5.5)))
    val p2 = Map(
      "long"  -> Timing(3.1, None, extCores = Some(1.2)))
    assert(Bench.extMaxWindow(Seq(p1, p2)) === Some(5.5))
    assert(Bench.extMaxWindow(Seq(Map("q" -> Timing(1.0, None)))) === None,
      "no measurable windows -> None, not Some(0)")
  }

  test("compact line carries ext_max_win and pass_ratio when measured") {
    import Bench.Contention
    val line = Bench.compactLine(Seq("q1" -> 1.0), 0, 2.0, 2.8, "/sf",
      extCpuCores = Some(0.5),
      contention = Contention(Some(0.5), Some(6.25), Some(0.7)))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("ext_max_win").asDouble === 6.25)
    assert(node.get("pass_ratio").asDouble === 0.7)
    assert(node.get("contended").asBoolean === true, "6.25-core window > 4.0 floor")
  }

  test("compact line stays valid JSON when every query failed") {
    val line = Bench.compactLine(Seq.empty, failedCount = 5,
      wallSec = 1.0, ratio = 0.5, sfDir = "/root/testdata/sf0.1")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("value").asDouble === 0.0)
    assert(node.get("n_queries").asInt === 0)
    assert(node.get("failed").asInt === 5)
  }

  test("fmt2 trims without locale surprises") {
    assert(Bench.fmt2(0.39499) == "0.39")
    assert(Bench.fmt2(1.204) == "1.2")
    assert(Bench.fmt2(12.0) == "12")
    assert(Bench.fmt2(0.0) == "0")
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
      "dedup_semantic" -> "sim_ann_ivf2", // same cache, two-level probe
      "dedup_semantic" -> "dedup_semantic2", // same cache, two-level assignment
      "graph_bfs" -> "graph_pagerank", // minhash pair cache (bfs builds, r12)
      "graph_bfs" -> "graph_triangles") // same pair cache
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
