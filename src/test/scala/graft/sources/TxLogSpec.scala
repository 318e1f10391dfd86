package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Transaction-log table semantics: snapshot isolation, atomic commit
  * visibility, and loud failure on a torn or inconsistent log. */
class TxLogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A tiny hand-built table: v0 adds two files, v1 removes one and
    * adds another — enough to exercise every replay rule. */
  private def buildTable(): String = {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-txlog-spec").toString
    val logDir = Files.createDirectory(Paths.get(table, "_txlog"))
    def writeFile(tag: String, ids: Seq[Long]): String = {
      ids.toDF("doc_id").coalesce(1).write.mode("overwrite")
        .parquet(s"$table/d-$tag")
      val part = new java.io.File(s"$table/d-$tag").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getName
      s"d-$tag/$part"
    }
    val f0 = writeFile("a", Seq(1L, 2L))
    val f1 = writeFile("b", Seq(3L, 4L))
    val f2 = writeFile("c", Seq(5L))
    Files.write(logDir.resolve(f"${0L}%020d.json"),
      s"""{"add":{"path":"$f0"}}\n{"add":{"path":"$f1"}}\n""".getBytes("UTF-8"))
    Files.write(logDir.resolve(f"${1L}%020d.json"),
      s"""{"remove":{"path":"$f0"}}\n{"add":{"path":"$f2"}}\n""".getBytes("UTF-8"))
    table
  }

  private def ids(table: String, v: Long): Set[Long] =
    TxLogSource.readSnapshot(spark, table, v)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("snapshot isolation: each version sees exactly its own file set") {
    val t = buildTable()
    assert(ids(t, 0L) === Set(1L, 2L, 3L, 4L))
    assert(ids(t, 1L) === Set(3L, 4L, 5L)) // f0 removed, f2 added
    // time travel: the removed file's rows are still readable at v0
    assert(ids(t, 0L).contains(1L))
  }

  test("an in-flight temp commit is invisible, not a crash or a torn read") {
    val t = buildTable()
    // a writer mid-commit: dot-prefixed temp file in the log dir
    Files.write(Paths.get(t, "_txlog", ".tmp-commit-xyz.json"),
      """{"add":{"path":"d-a/garbage.parquet"}}""".getBytes("UTF-8"))
    assert(ids(t, 1L) === Set(3L, 4L, 5L), "pending commit must be ignored")
  }

  test("commit statistics actually prune files; stats-less adds never prune") {
    import spark.implicits._
    // stats-less commits (buildTable): every live file survives any
    // range — pruning degrades to correct, never to wrong
    val t = buildTable()
    assert(TxLogSource.prunedFiles(t, 1L, 100L, 200L).size
      === TxLogSource.liveFiles(t, 1L).size)
    // statted table: three files with disjoint id ranges
    val t2 = Files.createTempDirectory("graft-txlog-stat").toString
    val logDir = Files.createDirectory(Paths.get(t2, "_txlog"))
    def writeFile(tag: String, ids: Seq[Long]): String = {
      ids.toDF("doc_id").coalesce(1).write.mode("overwrite")
        .parquet(s"$t2/d-$tag")
      val part = new java.io.File(s"$t2/d-$tag").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getName
      s"d-$tag/$part"
    }
    val adds = Seq(
      (writeFile("a", Seq(1L, 2L)), 1L, 2L),
      (writeFile("b", Seq(3L, 4L)), 3L, 4L),
      (writeFile("c", Seq(10L, 11L)), 10L, 11L))
    Files.write(logDir.resolve(f"${0L}%020d.json"),
      adds.map { case (p, lo, hi) =>
        s"""{"add":{"path":"$p","minId":$lo,"maxId":$hi}}"""
      }.mkString("", "\n", "\n").getBytes("UTF-8"))
    assert(TxLogSource.liveFiles(t2, 0L).size === 3)
    // the range [3,4] must open exactly ONE file, and the answer is
    // identical to filtering the full snapshot
    assert(TxLogSource.prunedFiles(t2, 0L, 3L, 4L).size === 1)
    val pruned = TxLogSource.readSnapshotPruned(spark, t2, 0L, 3L, 4L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(pruned === Set(3L, 4L))
    // a range spanning a gap in the stats ([5,9]) overlaps nothing
    assert(TxLogSource.prunedFiles(t2, 0L, 5L, 9L).isEmpty)
  }

  test("racing committers: exactly one wins the slot, winner's content survives intact") {
    val logDir = Files.createTempDirectory("graft-txlog-race")
    // 8 threads race the same version with distinct payloads — the
    // createLink primitive must admit exactly one (rename would let
    // a later committer silently replace the winner)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val attempts = (0 until 8).map { k =>
      Future {
        gate.await()
        k -> TxLogSource.commitIfAbsent(logDir, 7L,
          Seq(s"""{"add":{"path":"d/committer-$k.parquet"}}"""))
      }
    }
    gate.countDown()
    val results = Await.result(Future.sequence(attempts), 60.seconds)
    val winners = results.filter(_._2)
    assert(winners.size === 1, s"exactly one committer must win, got $results")
    val content = new String(Files.readAllBytes(
      logDir.resolve(f"${7L}%020d.json")), "UTF-8")
    assert(content.contains(s"committer-${winners.head._1}.parquet"),
      "the slot must hold the WINNER's payload, not a later overwrite")
    // a later attempt on the same slot also loses
    assert(!TxLogSource.commitIfAbsent(logDir, 7L, Seq("""{"add":{"path":"x"}}""")))
    // no temp litter left behind
    assert(new java.io.File(logDir.toString).listFiles()
      .forall(!_.getName.startsWith(".tmp-")))
  }

  test("a gap in the commit sequence fails loudly (torn snapshot)") {
    val t = buildTable()
    Files.delete(Paths.get(t, "_txlog", f"${0L}%020d.json"))
    val e = intercept[IllegalArgumentException] { TxLogSource.liveFiles(t, 1L) }
    assert(e.getMessage.contains("gap"), e.getMessage)
  }

  test("removing an unknown file or re-adding a live one fails loudly") {
    val t = buildTable()
    Files.write(Paths.get(t, "_txlog", f"${2L}%020d.json"),
      """{"remove":{"path":"d-z/never-added.parquet"}}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] { TxLogSource.liveFiles(t, 2L) }
    assert(e.getMessage.contains("unknown"), e.getMessage)
    Files.write(Paths.get(t, "_txlog", f"${2L}%020d.json"),
      """{"add":{"path":"d-b/REPLACE.parquet"}}""".getBytes("UTF-8"))
    // make it a duplicate of a live path
    val live = TxLogSource.liveFiles(t, 1L)
    Files.write(Paths.get(t, "_txlog", f"${2L}%020d.json"),
      s"""{"add":{"path":"${live.head}"}}""".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] { TxLogSource.liveFiles(t, 2L) }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
  }

  test("checkpoint resolution matches full replay and reads only the tail") {
    val t = buildTable()
    TxLogSource.writeCheckpoint(spark, t, 0L)
    // same live set either way, at and after the checkpoint version
    for (v <- 0L to 1L) {
      val res = TxLogSource.resolveSnapshot(spark, t, v)
      assert(res.usedCheckpoint, s"v$v should resolve via checkpoint")
      assert(res.replayedCommits == v.toInt, s"v$v tail length")
      assert(res.files.toSet == TxLogSource.liveFilesWithStats(t, v).toSet,
        s"v$v checkpoint read diverges from full replay")
    }
    // snapshot CONTENT through the checkpoint path matches too
    val files = TxLogSource.resolveSnapshot(spark, t, 1L).files
      .map(f => s"$t/${f._1}")
    val got = spark.read.parquet(files: _*)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 4L, 5L))
  }

  test("checkpoint advances; time travel below it falls back to full replay") {
    val t = buildTable()
    TxLogSource.writeCheckpoint(spark, t, 0L)
    TxLogSource.writeCheckpoint(spark, t, 1L) // REPLACE of the pointer
    assert(TxLogSource.lastCheckpointVersion(t).contains(1L))
    val at1 = TxLogSource.resolveSnapshot(spark, t, 1L)
    assert(at1.usedCheckpoint && at1.replayedCommits == 0)
    // v0 predates the newest checkpoint: correctness wins, full replay
    val at0 = TxLogSource.resolveSnapshot(spark, t, 0L)
    assert(!at0.usedCheckpoint)
    assert(at0.files.toSet == TxLogSource.liveFilesWithStats(t, 0L).toSet)
  }

  test("a torn or dangling _last_checkpoint degrades to full replay, not a crash") {
    val t = buildTable()
    // garbage pointer
    Files.write(Paths.get(t, "_txlog", "_last_checkpoint"),
      "not json at all".getBytes("UTF-8"))
    val r1 = TxLogSource.resolveSnapshot(spark, t, 1L)
    assert(!r1.usedCheckpoint &&
      r1.files.toSet == TxLogSource.liveFilesWithStats(t, 1L).toSet)
    // pointer names a checkpoint file that does not exist
    Files.write(Paths.get(t, "_txlog", "_last_checkpoint"),
      """{"version":1}""".getBytes("UTF-8"))
    val r2 = TxLogSource.resolveSnapshot(spark, t, 1L)
    assert(!r2.usedCheckpoint, "dangling pointer must be ignored")
  }

  test("vacuum deletes exactly the pre-horizon removes; later snapshots intact") {
    val t = buildTable() // v0 adds f0,f1; v1 removes f0, adds f2
    val f0 = TxLogSource.liveFiles(t, 0L)
      .filterNot(TxLogSource.liveFiles(t, 1L).toSet).head
    assert(Files.exists(Paths.get(t, f0)))
    // horizon 0: nothing removed at or below v0 → no-op
    assert(TxLogSource.vacuum(t, 0L) == 0)
    assert(Files.exists(Paths.get(t, f0)))
    // horizon 1: f0's remove is in scope → deleted, once
    assert(TxLogSource.vacuum(t, 1L) == 1)
    assert(!Files.exists(Paths.get(t, f0)))
    assert(TxLogSource.vacuum(t, 1L) == 1, "idempotent replay, file already gone")
    // the newest snapshot still reads (its files untouched)
    assert(ids(t, 1L) === Set(3L, 4L, 5L))
    // time travel to v0 now fails at scan time — loudly, not wrong
    intercept[Exception] { ids(t, 0L) }
  }

  test("a gap in the tail after the checkpoint still fails loudly") {
    val t = buildTable()
    TxLogSource.writeCheckpoint(spark, t, 0L)
    // commit v3 exists but v2 is missing: torn tail
    Files.write(Paths.get(t, "_txlog", f"${3L}%020d.json"),
      """{"add":{"path":"d-c/extra.parquet"}}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      TxLogSource.resolveSnapshot(spark, t, 3L)
    }
    assert(e.getMessage.contains("gap"), e.getMessage)
  }
}
