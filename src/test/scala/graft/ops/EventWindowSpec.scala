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
}
