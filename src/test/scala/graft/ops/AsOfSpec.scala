package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** leftAsOf semantics that the oracle compare alone can't pin down:
  * the duplicate-(key, ts) tie-break must be deterministic across any
  * partitioning (VERDICT r2 "what's wrong" #2). */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("duplicate (key, ts) right rows: max tie-break event wins, any partitioning") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 09:00:00")), // before any purchase → null
      (102L, 2L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    // user 1 has TWO purchases at the identical timestamp: the larger
    // event_id (11, value 7.0) must win, on every partitioning
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10L, 5.0),
      (1L, ts("2024-01-01 09:30:00"), 11L, 7.0),
      (2L, ts("2024-01-01 11:00:00"), 20L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")

    for (parts <- Seq(1, 3, 7)) {
      val got = AsOfOps.leftAsOf(
          left.repartition(parts), right.repartition(parts),
          "user_id", "ts", Seq("event_id", "value", "ts"),
          tieBreak = Some("event_id"))
        .select(col("event_id"), col("__asof.event_id").as("pid"),
          col("__asof.value").as("pv"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)))).toMap
      assert(got(100L) === ((Some(11L), Some(7.0))), s"parts=$parts")
      assert(got(101L) === ((None, None)), s"parts=$parts")
      assert(got(102L) === ((Some(20L), Some(3.0))), s"parts=$parts")
    }
  }

  test("join_scd2_pit: pre-status purchases are 'none'; equal-ts status applies inclusively") {
    val rows = Seq(
      // user 1: purchase BEFORE any status → 'none'; then view; then
      // a purchase at EXACTLY the view's ts → inclusive → 'view'
      (1L, ts("2024-01-01 08:00:00"), 1L, "purchase", 10.0, "{}"),
      (2L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 09:00:00"), 1L, "purchase", 20.0, "{}"),
      // user 2: click, then a later status change to error, purchase after each
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "purchase", 5.0, "{}"),
      (6L, ts("2024-01-01 11:00:00"), 2L, "error", 1.0, "{}"),
      (7L, ts("2024-01-01 12:00:00"), 2L, "purchase", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-pit").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AsOfOps.scd2PitJoin(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map("none" -> ((1L, 10.0)), "view" -> ((1L, 20.0)),
      "click" -> ((1L, 5.0)), "error" -> ((1L, 7.0))), out.toString)
    graft.ops.OpsUtil.deleteRecursively(dir)
  }

  test("inclusive as-of: a right row at exactly the left ts matches") {
    val left = Seq((1L, 5L, ts("2024-02-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((5L, ts("2024-02-01 00:00:00"), 50L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = AsOfOps.leftAsOf(left, right, "user_id", "ts",
        Seq("event_id", "value", "ts"), tieBreak = Some("event_id"))
      .select(col("__asof.event_id")).as[Option[Long]].head()
    assert(got === Some(50L))
  }
}
