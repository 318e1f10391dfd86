package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Trigger-execution accounting for the declared `stream_*` queries
  * (r14 verdict item 7): a stream query's WALL time is trigger
  * execution + trigger-schedule waits + drop staging + sink read-back
  * by construction, so wall regressions are unattributable without
  * the split. Every [[EventStreams]] run site credits its finished
  * [[StreamingQuery]]'s summed `triggerExecution` here; the bench
  * resets the meter around each declared query and reports
  * (wall, exec) per stream query in BENCH_DETAIL — wall minus exec is
  * the non-compute share (trigger waits + staging + read-back).
  *
  * A process-wide accumulator is sufficient because the bench times
  * queries strictly sequentially; concurrent test suites only ever
  * read their own delta between reset() and execMs(). */
object StreamMeter {

  private val totalExecMs = new java.util.concurrent.atomic.AtomicLong(0)

  def reset(): Unit = totalExecMs.set(0)

  /** Sum of `triggerExecution` across the query's recorded progress
    * events (recentProgress retains the last
    * `spark.sql.streaming.numRecentProgressUpdates` = 100 — far above
    * any declared query's micro-batch count). Call AFTER the query
    * has terminated. */
  def addQuery(q: StreamingQuery): Unit = {
    val ms = q.recentProgress.map { p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
    }.sum
    totalExecMs.addAndGet(ms)
    ()
  }

  /** Milliseconds of trigger execution credited since the last reset. */
  def execMs: Long = totalExecMs.get
}
