package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Prints every micro-batch's durationMs decomposition — registered
  * via spark.sql.streaming.streamingQueryListeners so the per-call
  * `newSession` clones inside EventStreams inherit it. */
class ProgressPrinter extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    import scala.jdk.CollectionConverters._
    val d = e.progress.durationMs.asScala.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
    println(s"    progress batch=${e.progress.batchId} rows=${e.progress.numInputRows} $d")
  }
}

/** Stage-level profiler for the streaming declared queries — built to
  * chase the r11 bench creep (stream_attribution 1.96→2.71 s,
  * stream_user_totals 2.17→2.57 s quiet-box with no code change to
  * either). A SparkListener records every job's wall span and
  * description, so each query's end-to-end time decomposes into its
  * Spark jobs (staging writes, schema probe, micro-batch execution,
  * sink read-back) plus unaccounted driver time (query planning, state
  * store setup, WAL commits — streaming overheads that run between
  * jobs), instead of guessing from the end-to-end number.
  *
  * Usage: sbt "runMain graft.tools.StreamProfile [sfDir] [reps]"
  */
object StreamProfile {

  final case class Job(id: Int, desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.tools.ProgressPrinter")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, Job(j.jobId,
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?"),
          System.nanoTime(), 0L))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val job = jobs.get(j.jobId)
        if (job != null) job.end = System.nanoTime()
      }
    })

    def profiled(name: String)(f: => Unit): Unit = {
      jobs.clear()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      import scala.jdk.CollectionConverters._
      val done = jobs.values().asScala.filter(_.end > 0).toSeq.sortBy(_.start)
      val jobSec = done.map(j => (j.end - j.start) / 1e9).sum
      println(f"$name: wall=$wall%.2fs jobs=${done.size} jobSec=$jobSec%.2fs " +
        f"driverGap=${wall - jobSec}%.2fs")
      done.foreach { j =>
        val d = (j.end - j.start) / 1e9
        if (d > 0.05)
          println(f"    job ${j.id}%3d  $d%6.2fs  ${j.desc.replaceAll("\\s+", " ").take(110)}")
      }
    }

    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      profiled("stream_attribution")(
        graft.streaming.EventStreams.streamAttribution(spark, sfDir).count())
      profiled("stream_user_totals")(
        graft.streaming.EventStreams.streamUserTotals(spark, sfDir).count())
    }
    spark.stop()
  }
}
