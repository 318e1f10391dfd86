package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.OpsUtil.{tokens, xhash60}

/** Structured Streaming face of the training-data INGEST pipeline —
  * the corpus counterpart of [[EventStreams]]: documents arrive as
  * file drops, pass a stateless quality gate, are exact-deduped on a
  * content hash, and feed per-source admission statistics. The batch
  * counterparts are graft.ops.TextAnalysisOps (gates) and
  * graft.ops.DedupOps.dedupExact / TrainingPrepOps.dedupIncremental
  * (hash dedup); StreamingSpec asserts batch ≡ stream.
  *
  * Scale stance: the quality gate is pure map-side (no state); dedup
  * state is ONE 60-bit key per admitted (source, doc) — never text
  * bytes — so state size is |corpus| × 8-ish bytes spread across the
  * state store's key partitions. On an unbounded production stream the
  * same pipeline bounds state by arrival time
  * (`withWatermark` + `dropDuplicatesWithinWatermark`) — a re-crawled
  * duplicate older than the horizon re-enters, which is the standard
  * at-least-once ingest trade. The bounded-backfill shape here (no
  * watermark, AvailableNow) is what a catch-up ingest run uses.
  */
object CorpusStreams {

  private val rawSchema =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** File-based document stream from a directory of parquet drops. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(rawSchema).parquet(dir)

  /** Stateless quality gate (Gopher-lite length rules) + content-hash
    * projection: the per-document map stage of the ingest. Exposed
    * separately so the batch mirror in tests is the SAME function
    * applied to a batch frame. */
  def gated(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), tokens(col("text")).as("tk"),
        xhash60(col("text"), 31).as("h"))
      .where(size(col("tk")) >= 3 && size(col("tk")) <= 100000)
      .select(col("source"), size(col("tk")).as("n_tok"), col("h"))

  /** Streaming ingest statistics: gate → exact dedup per (source,
    * content-hash) → per-source admitted doc/token counts. Keyed on
    * (source, h) so the output is deterministic however duplicates
    * are ordered across micro-batches — survivor identity can't leak
    * into the counts. */
  def ingestStats(docs: DataFrame): DataFrame =
    gated(docs)
      .dropDuplicates("source", "h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_admitted"), sum(col("n_tok")).as("n_tokens"))
}
