package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The MERGE/upsert core: SCD-1 semantics (source wins), all four
  * merge actions, and the declared corpus query's class coverage. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeUpsertOn tags insert/update/noop/carry correctly, source wins") {
    // target: keys 1-4; source: 2 (unchanged), 3 (changed), 5 (new).
    // key 1 and 4 are target-only carries.
    val tgt = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 30L), (4L, "fr", 40L))
      .toDF("doc_id", "lang", "n_chars")
    val src = Seq((2L, "en", 20L), (3L, "de", 37L), (5L, "ja", 50L))
      .toDF("doc_id", "lang", "n_chars")
    val got = TrainingPrepOps.mergeUpsertOn(tgt, src).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, "en", 10L, "carry"),
      (2L, "en", 20L, "noop"),
      (3L, "de", 37L, "update"), // source value wins
      (4L, "fr", 40L, "carry"),
      (5L, "ja", 50L, "insert")))
  }

  test("a lang-only change still reports noop (the declared change column is n_chars)") {
    // SCD-1 on the value column: the action tag keys off n_chars, but
    // source attributes still win on a match — documents both facts.
    val tgt = Seq((7L, "en", 10L)).toDF("doc_id", "lang", "n_chars")
    val src = Seq((7L, "EN", 10L)).toDF("doc_id", "lang", "n_chars")
    val r = TrainingPrepOps.mergeUpsertOn(tgt, src).collect()(0)
    assert((r.getString(1), r.getString(3)) === (("EN", "noop")))
  }

  test("declared merge_upsert exercises all four actions on the sf0.001 corpus") {
    val actions = TrainingPrepOps.mergeUpsert(spark, "/root/testdata/sf0.001")
      .groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.keySet === Set("insert", "update", "noop", "carry"),
      s"missing merge classes: $actions")
    // every doc_id%12==0 row is an update, every odd multiple of 3 an
    // insert — spot-check the routing arithmetic end to end
    val rows = TrainingPrepOps.mergeUpsert(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    rows.foreach { case (id, act) =>
      if (id % 12 == 0) assert(act === "update", s"doc $id")
      else if (id % 3 == 0 && id % 2 != 0) assert(act === "insert", s"doc $id")
      else if (id % 6 == 0) assert(act === "noop", s"doc $id")
      else assert(act === "carry", s"doc $id")
    }
  }
}
