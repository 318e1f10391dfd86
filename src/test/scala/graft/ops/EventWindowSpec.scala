package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Semantic pin for the RANGE-frame rolling window: days absent from
  * the data must SHRINK the trailing-7-day window (a ROWS frame would
  * silently span the gap and inflate the count).
  */
class EventWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("evt_bootstrap: pure-Scala Poisson-bootstrap replay matches bit-for-bit") {
    val sf = "/root/testdata/sf0.001"
    val row = EventOps.bootstrap(spark, sf).collect()(0)
    // independent replay: md5-based xhash60, inverse-CDF Poisson(1)
    // weights, BigDecimal resample sums — no Spark expressions involved
    def u(id: String, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"11:$id:$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000000L
    }
    val cdf = Seq(367879441L, 735758882L, 919698602L, 981011843L, 996340153L)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0).toString, r.getDouble(1)))
    val means = (0 until 100).map { b =>
      var sw = 0L
      var sv = BigDecimal(0)
      ev.foreach { case (id, v) =>
        val w = cdf.indexWhere(u(id, b) < _) match { case -1 => 5L; case k => k.toLong }
        sw += w
        sv += BigDecimal(w * v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      b -> sv.toDouble / sw
    }.sortBy { case (b, m) => (m, b) }.map(_._2)
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) === ev.length)
    assert(row.getDouble(2) === r9(means(2)), "ci_lo must equal rank-3 resample mean")
    assert(row.getDouble(3) === r9(means(97)), "ci_hi must equal rank-98 resample mean")
    assert(row.getDouble(2) <= row.getDouble(1) && row.getDouble(1) <= row.getDouble(3),
      "point estimate inside the 95% CI")
  }

  test("evt_auc: hand-computed midrank AUC, perfect separation, and tie handling") {
    import spark.implicits._
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    var id = 0L
    def clicks(u: Long, n: Int) =
      (1 to n).map { k => id += 1; (id, t(k % 24), u, "click", 1.0, "{}") }
    def buy(u: Long) = { id += 1; Seq((id, t(12), u, "purchase", 250.0, "{}")) }
    // scores: neg {0, 1, 2}, pos {2, 3} — one tie at score 2.
    // pairs (neg,pos): (0,2)+ (0,3)+ (1,2)+ (1,3)+ (2,3)+ (2,2)=tie½
    // → AUC = 5.5/6
    val rows =
      clicks(1, 1) ++                       // neg, s=1
      clicks(2, 2) ++                       // neg, s=2
      Seq({ id += 1; (id, t(1), 3L, "view", 1.0, "{}") }) ++ // neg, s=0
      clicks(4, 2) ++ buy(4) ++             // pos, s=2
      clicks(5, 3) ++ buy(5)                // pos, s=3
    val dir = java.nio.file.Files.createTempDirectory("graft-auc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.aucClicks(spark, dir).collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 5.5 / 6) < 1e-9, s"auc ${r.getDouble(2)}")
  }

  test("evt_prf: confusion cells and P/R/F1 from a hand-built operating point") {
    import spark.implicits._
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    var id = 0L
    def user(u: Long, nClicks: Int, buys: Boolean) = {
      val cs = (1 to nClicks).map { k => id += 1; (id, t(k % 24), u, "click", 1.0, "{}") }
      val b = if (buys) { id += 1; Seq((id, t(12), u, "purchase", 250.0, "{}")) }
              else { id += 1; Seq((id, t(12), u, "view", 1.0, "{}")) }
      cs ++ b
    }
    // threshold 3: tp = u1 (4 clicks, buys), fp = u2 (3 clicks, no),
    // fn = u3 (1 click, buys), tn = u4 (0 clicks, no)
    val rows = user(1, 4, buys = true) ++ user(2, 3, buys = false) ++
      user(3, 1, buys = true) ++ user(4, 0, buys = false)
    val dir = java.nio.file.Files.createTempDirectory("graft-prf").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.prfClicks(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === ((1L, 1L, 1L, 1L)))
    assert(r.getDouble(5) === 0.5 && r.getDouble(6) === 0.5 && r.getDouble(7) === 0.5)
  }

  test("evt_did: nets out the arm gap and the common trend exactly") {
    import spark.implicits._
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    // control (even users): before 10, after 13 (trend +3)
    // treated (odd users): before 20, after 28 (trend +3, effect +5)
    // cut = min(day)+15 = Jan 16: days 1 and 20 straddle it
    val rows = Seq(
      (1L, ts(1), 2L, "click", 10.0, "{}"),
      (2L, ts(20), 2L, "click", 13.0, "{}"),
      (3L, ts(1), 1L, "click", 20.0, "{}"),
      (4L, ts(20), 1L, "click", 28.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-did").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.didValue(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 1L, 1L, 1L)))
    assert(r.getDouble(4) === 10.0 && r.getDouble(5) === 13.0)
    assert(r.getDouble(6) === 20.0 && r.getDouble(7) === 28.0)
    assert(r.getDouble(8) === 5.0, s"did = ${r.getDouble(8)}")
  }

  test("evt_ttest: symmetric arms give exactly t=0, df=2; guards survive") {
    import spark.implicits._
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // arm 0 (even users): totals {1, 3}; arm 1 (odd): totals {1, 3}
    val rows = Seq(
      (1L, t(1), 2L, "click", 1.0, "{}"),
      (2L, t(2), 4L, "click", 3.0, "{}"),
      (3L, t(3), 1L, "click", 1.0, "{}"),
      (4L, t(4), 3L, "click", 3.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ttest").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.ttestValue(spark, dir).collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 2.0)
    assert(r.getDouble(4) === 0.0, s"symmetric arms: t = ${r.getDouble(4)}")
    assert(r.getDouble(5) === 2.0, s"equal variances, n=2 each: df = ${r.getDouble(5)}")
  }

  test("evt_logreg: separable corpus learns the right signs and classifies perfectly") {
    import spark.implicits._
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    var id = 0L
    // users 1..20: clickers who purchase; 21..40: error-ers who don't
    val rows =
      (for (u <- 1L to 20L; k <- 1 to 10) yield { id += 1; (id, t(k % 24), u, "click", 1.0, "{}") }) ++
      (for (u <- 1L to 20L) yield { id += 1; (id, t(12), u, "purchase", 250.0, "{}") }) ++
      (for (u <- 21L to 40L; k <- 1 to 10) yield { id += 1; (id, t(k % 24), u, "error", 0.0, "{}") })
    val dir = java.nio.file.Files.createTempDirectory("graft-logreg").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.logreg(spark, dir).collect()(0)
    assert(r.getLong(0) === 40L && r.getLong(1) === 20L)
    assert(r.getDouble(3) > 0, s"click weight must be positive: ${r.getDouble(3)}")
    assert(r.getDouble(5) < 0, s"error weight must be negative: ${r.getDouble(5)}")
    assert(r.getDouble(6) === 1.0, s"separable data: accuracy ${r.getDouble(6)}")
    // determinism: the whole training run replays bit-identically
    val r2 = EventOps.logreg(spark, dir).collect()(0)
    assert(r === r2)
  }

  test("evt_attr_positional: U-shaped credit with window and post-purchase exclusions") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      // user 10: 3 in-window clicks (Mon first, Tue middle, Wed last),
      // one >7d before, one AFTER the purchase — both must be ignored
      (1L, t("2024-01-10 12:00:00"), 10L, "purchase", 100.0, "{}"),
      (2L, t("2024-01-08 09:00:00"), 10L, "click", 0.0, "{}"),
      (3L, t("2024-01-09 09:00:00"), 10L, "click", 0.0, "{}"),
      (4L, t("2024-01-10 09:00:00"), 10L, "click", 0.0, "{}"),
      (5L, t("2024-01-01 09:00:00"), 10L, "click", 0.0, "{}"),
      (6L, t("2024-01-10 13:00:00"), 10L, "click", 0.0, "{}"),
      // user 11: single touch takes 100%
      (7L, t("2024-01-10 12:00:00"), 11L, "purchase", 10.0, "{}"),
      (8L, t("2024-01-09 10:00:00"), 11L, "click", 0.0, "{}"),
      // user 12: two touches split 50/50
      (9L, t("2024-01-10 12:00:00"), 12L, "purchase", 10.0, "{}"),
      (10L, t("2024-01-08 10:00:00"), 12L, "click", 0.0, "{}"),
      (11L, t("2024-01-09 11:00:00"), 12L, "click", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-attrpos").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.attrPositional(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // Spark dayofweek: Mon=2, Tue=3, Wed=4
    assert(out === Map(
      2 -> ((2L, 45.0)),  // 40 (u10 first) + 5 (u12 first)
      3 -> ((3L, 35.0)),  // 20 (u10 middle) + 10 (u11 solo) + 5 (u12 last)
      4 -> ((1L, 40.0)))) // u10 last
  }

  test("evt_backtest: seasonal-naive scores only days with a t-7 observation") {
    import spark.implicits._
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    // "click": count(day d) = d for d in 1..14 → days 8..14 scored,
    // every error exactly 7. "view": days 1 and 9 only → no (d, d-7)
    // pair exists, so the type must be absent from the output
    var id = 0L
    val rows =
      (for (d <- 1 to 14; _ <- 1 to d) yield { id += 1; (id, ts(d), 1L, "click", 1.0, "{}") }) ++
      Seq((9001L, ts(1), 2L, "view", 1.0, "{}"), (9002L, ts(9), 2L, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-evbt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.backtest(spark, dir).collect()
    assert(out.length === 1 && out(0).getString(0) === "click",
      "gap-only type must not be scored")
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expMape = r9((8 to 14).map(t => r9(7.0 / t)).map(BigDecimal(_)).sum.toDouble / 7)
    assert(out(0).getLong(1) === 7L)
    assert(out(0).getDouble(2) === 7.0)
    assert(out(0).getDouble(3) === expMape)
  }

  test("evt_gap_fill: silent days EXIST as zero rows") {
    import spark.implicits._
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // Jan 1 (2 events), Jan 2..4 silent, Jan 5 (1 event): the driver
    // data has no empty days, so the fill path needs planted gaps
    val rows = Seq(
      (1L, ts(1, 9), 10L, "click", 1.0, "{}"),
      (2L, ts(1, 10), 10L, "click", 1.0, "{}"),
      (3L, ts(5, 9), 11L, "click", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-evgap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.gapFillDaily(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
    assert(out.toSeq === Seq(
      "2024-01-01" -> 2L, "2024-01-02" -> 0L, "2024-01-03" -> 0L,
      "2024-01-04" -> 0L, "2024-01-05" -> 1L))
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_anomaly: a planted spike flags, its neighbors and warmup days don't") {
    import spark.implicits._
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // 20 quiet days of 2-3 events (variance > 0 so the gate opens),
    // then day 21 spikes to 40 — far past 2σ of the trailing window.
    var id = 0L
    val rows = (1 to 20).flatMap { day =>
      val k = 2 + (day % 2) // alternate 2 and 3 events
      (0 until k).map { h => id += 1; (id, ts(day, 9 + h), day.toLong, "click", 1.0, "{}") }
    } ++ (0 until 40).map { h => id += 1; (id, ts(21, h % 24), 99L, "click", 1.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("graft-evanom").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.anomalyDays(spark, dir).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getAs[Boolean]("is_anomaly")))).toMap
    assert(out("2024-01-21") === ((40L, 14L, true)), s"spike must flag: $out")
    // warmup days (< 7 baseline days) must be gated out, not flagged
    assert(!out("2024-01-01")._3 && !out("2024-01-05")._3)
    assert(out("2024-01-05")._2 < 7) // still warming up
    // quiet steady days never flag
    (8 to 20).foreach(d => assert(!out(f"2024-01-$d%02d")._3, s"day $d"))
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_rolling: a calendar gap shrinks the trailing window") {
    import spark.implicits._
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val rows = Seq(
      (1L, ts(1, 9), 10L, "click", 1.0, "{}"),
      (2L, ts(1, 10), 10L, "click", 1.0, "{}"),
      (3L, ts(2, 9), 11L, "click", 1.0, "{}"),
      // 7-day silence; day 10's trailing window [Jan 4, Jan 10]
      // contains only itself
      (4L, ts(10, 9), 12L, "click", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-evroll").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.rolling7d(spark, dir).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "2024-01-01" -> ((2L, 2L)),
      "2024-01-02" -> ((1L, 3L)),   // day 1 still inside the 7-day frame
      "2024-01-10" -> ((1L, 1L)))) // gap: days 1-2 aged out by RANGE, not row count
  }

  test("evt_overlap: closed-interval semantics, cross-bin sessions, no cartesian plan") {
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (1L, ts(9, 0), 10L, "click", 1.0, "{}"),   // u10 s1 [9:00, 9:10]
      (2L, ts(9, 10), 10L, "click", 1.0, "{}"),
      (3L, ts(13, 0), 10L, "click", 1.0, "{}"),  // u10 s2 [13:00, 13:00]
      (4L, ts(9, 5), 11L, "click", 1.0, "{}"),   // u11 [9:05, 9:05]
      (5L, ts(12, 0), 12L, "click", 1.0, "{}"),  // u12 [12:00, 12:00]
      (6L, ts(9, 10), 13L, "click", 1.0, "{}"),  // u13 [9:10, 9:10] touches u10 s1
      (7L, ts(9, 55), 14L, "click", 1.0, "{}"),  // u14 [9:55, 10:05] spans 2 bins
      (8L, ts(10, 5), 14L, "click", 1.0, "{}"),
      (9L, ts(10, 0), 15L, "click", 1.0, "{}"))  // u15 [10:00, 10:00]
    val dir = java.nio.file.Files.createTempDirectory("graft-evover").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = EventOps.sessionOverlap(spark, dir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got === Map(
      (10L, 1L) -> 2L, // u11 inside + u13 touching the right endpoint
      (10L, 2L) -> 0L,
      (11L, 1L) -> 1L,
      (12L, 1L) -> 0L,
      (13L, 1L) -> 1L, // closed intervals: endpoint contact IS overlap
      (14L, 1L) -> 1L, // found via the 10:00 bin; dedup keeps it at 1
      (15L, 1L) -> 1L))
    // the whole point of the bin rewrite: candidates meet on an
    // EQUI-join, never a cartesian/nested-loop expansion
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a product plan:\n$plan")
  }

  test("evt_funnel_window: each stage's 24 h bound is closed at +24h and drops late steps") {
    import spark.implicits._
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    var id = 0L
    def ev(u: Long, t: Timestamp, typ: String) = { id += 1; (id, t, u, typ, 1.0, "{}") }
    val rows = Seq(
      // user 10: full in-window path → survives all 3 stages
      ev(10L, ts(1, 9), "view"), ev(10L, ts(1, 10), "click"), ev(10L, ts(1, 11), "purchase"),
      // user 11: click 25 h after first view → stops at stage 1
      ev(11L, ts(1, 9), "view"), ev(11L, ts(2, 10), "click"),
      // user 12: in-window click, purchase 25 h after it → stops at stage 2
      ev(12L, ts(1, 9), "view"), ev(12L, ts(1, 10), "click"), ev(12L, ts(2, 11), "purchase"),
      // user 13: click with NO view → appears in no stage
      ev(13L, ts(1, 10), "click"),
      // user 14: click at EXACTLY +24 h → inclusive bound keeps it
      ev(14L, ts(1, 9), "view"), ev(14L, ts(2, 9), "click"))
    val dir = java.nio.file.Files.createTempDirectory("graft-funwin").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.funnelWindow(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 4L, 2 -> 3L, 3 -> 1L), out.toString)
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_streaks: gaps split islands, multi-visit days don't inflate, singletons count") {
    import spark.implicits._
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    var id = 0L
    def ev(u: Long, day: Int, h: Int) = { id += 1; (id, ts(day, h), u, "click", 1.0, "{}") }
    val rows = Seq(
      // user 1: days 1,2,3 then 5,6 → best streak 3 (gap at day 4 splits)
      ev(1L, 1, 9), ev(1L, 2, 9), ev(1L, 3, 9), ev(1L, 5, 9), ev(1L, 6, 9),
      // user 2: day 1 twice (same day, two events) + day 3 → best 1
      ev(2L, 1, 9), ev(2L, 1, 15), ev(2L, 3, 9),
      // user 3: days 7,8 → best 2
      ev(3L, 7, 9), ev(3L, 8, 9))
    val dir = java.nio.file.Files.createTempDirectory("graft-streak").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.streaks(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L), out.toString)
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_pareto_users: integer-arithmetic deciles match the hand bucketing") {
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // 5 users, counts 6,1,1,1,1 (user 1 heaviest): ranks 1..5 →
    // deciles (r−1)·10 div 5 + 1 = 1,3,5,7,9; user 1 owns 60 % share
    var id = 0L
    val rows = Seq((1L, 6), (2L, 1), (3L, 1), (4L, 1), (5L, 1)).flatMap {
      case (u, c) => (0 until c).map { k => id += 1; (id, ts(9 + k, u.toInt), u, "click", 1.0, "{}") }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-pareto").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.paretoUsers(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1, 1L, 6L, 0.6), (3, 1L, 1L, 0.1), (5, 1L, 1L, 0.1),
      (7, 1L, 1L, 0.1), (9, 1L, 1L, 0.1)), out.mkString(","))
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_holt: a pure linear series is tracked exactly, forecasts continue the line") {
    import spark.implicits._
    def ts(day: Int, h: Int, m: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
    // c = 100 + 5·day: ℓ locks to the line (ℓ = x after one step),
    // b stays exactly 5, forecast(h) = last + 5·h — dyadic halves keep
    // every intermediate an exact double, so equality is exact
    val rows = (1 to 10).flatMap { day =>
      val c = 100 + 5 * day
      (0 until c).map { k => (day * 1000L + k, ts(day, 9 + k / 60, k % 60), 1L, "click", 1.0, "{}") }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-holt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.holtForecast(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
    assert(out.length === 7)
    out.foreach { case (h, (fc, level, trend)) =>
      assert(level === 150.0 && trend === 5.0, s"h=$h")
      assert(fc === 150.0 + 5.0 * h, s"forecast h=$h: $fc")
    }
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_anomaly_mad: even-count medians average BOTH middle ranks; spike flags") {
    import spark.implicits._
    def ts(day: Int, h: Int, m: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
    // counts 10,12,16,100 → med = (12+16)/2 = 14, deviations 4,2,2,86
    // → MAD = (2+4)/2 = 3 (DISTINCT middle ranks: selecting only one
    // of them — the float-division (n+1)/2 bug — would give 2 or 4)
    val counts = Seq(10, 12, 16, 100)
    var id = 0L
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map { k => id += 1; (id, ts(i + 1, 9 + k / 60, k % 60), 1L, "click", 1.0, "{}") }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.anomalyMad(spark, dir).collect()
      .map(r => r.getDate(0).toLocalDate.getDayOfMonth ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(5)))).toMap
    assert(out(1) === ((14.0, 3.0, false)))
    assert(out(4)._3 === true, "the spike day must flag")
    assert(!out(2)._3 && !out(3)._3)
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_theilsen: a planted outlier day doesn't move the median slope") {
    import spark.implicits._
    def ts(day: Int, h: Int, m: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
    // counts 10,12,14,16 rise by exactly 2/day; day 5 spikes to 58.
    // 6 of the 10 pairwise slopes are 2 → median 2.0 (OLS would be ~10)
    val counts = Seq(10, 12, 14, 16, 58)
    var id = 0L
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      (0 until c).map { k => id += 1; (id, ts(i + 1, 9 + k / 60, k % 60), 1L, "click", 1.0, "{}") }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-theil").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.theilSen(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((5L, 10L, 2.0)))
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_seasonal: a pure weekly signal decomposes to flat trend and zero residual") {
    import spark.implicits._
    def ts(day: Int, h: Int, m: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
    // 14 days of c = 100 + s[dow] with zero-sum s: every full 7-day
    // window sums to 700 → trend exactly 100, detrended = s, resid = 0
    val s = Array(7, -7, 0, 0, 0, 0, 0) // Jan 1 2024 is a Monday → dow 0
    var id = 0L
    val rows = (1 to 14).flatMap { day =>
      val c = 100 + s((day - 1) % 7)
      (0 until c).map { k => id += 1; (id, ts(day, 9 + k / 60, k % 60), 1L, "click", 1.0, "{}") }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-seas").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.seasonalDecompose(spark, dir).collect()
    assert(out.length === 8) // days 4..11 have the full centered window
    out.foreach { r =>
      val day = r.getDate(0).toLocalDate.getDayOfMonth
      assert(r.getDouble(2) === 100.0, s"trend day $day")
      assert(r.getDouble(3) === s((day - 1) % 7).toDouble, s"seasonal day $day")
      assert(r.getDouble(4) === 0.0, s"resid day $day")
    }
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("evt_gini: perfect equality is 0, a known unequal split matches the hand formula") {
    import spark.implicits._
    // type "eq": four users × 5 events each → G = 0 exactly.
    // type "uneq": counts (1, 1, 2, 8): sorted ranks 1..4, Σx = 12,
    // Σ i·xᵢ = 1 + 2 + 6 + 32 = 41 → G = (82 − 60) / 48 = 11/24.
    val counts = Seq(
      ("eq", 1L, 5L), ("eq", 2L, 5L), ("eq", 3L, 5L), ("eq", 4L, 5L),
      ("uneq", 1L, 1L), ("uneq", 2L, 1L), ("uneq", 3L, 2L), ("uneq", 4L, 8L))
      .toDF("event_type", "user_id", "x")
    val out = EventOps.giniOnCounts(counts).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("eq") === ((4L, 20L, 0.0)))
    assert(out("uneq") === ((4L, 12L, 11.0 / 24.0)))
  }

  test("evt_concurrency: two-level prefix equals the known sweep, across hour and day edges") {
    import spark.implicits._
    val H = 3600000L
    // Day 1: A [0, 2h], B [1h, 1.5h] (peak 2 inside hour 1),
    // C starts EXACTLY when A ends (closed intervals: concurrent → 2).
    // B2 [23.5h, 24.5h] spans midnight: day 2 opens with it live, and
    // D [24.2h, 24.3h] overlaps it → day-2 peak 2 carried across the
    // day boundary (the carry_in path, not an intra-day window).
    val sess = Seq(
      (1L, 1L, 0L, 2 * H), (2L, 1L, H, H + H / 2), (3L, 1L, 2 * H, 3 * H),
      (4L, 1L, 47 * H / 2, 49 * H / 2), (5L, 1L, 121 * H / 5, 607 * H / 25))
      .toDF("user_id", "session_seq", "start_ms", "end_ms")
    val out = EventOps.concurrencyOnSessions(sess).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out === Map("1970-01-01" -> 2L, "1970-01-02" -> 2L))
  }
}
