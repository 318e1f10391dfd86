package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink breadth beyond the reference's text-only surface
  * (SURVEY.md §2.3 scans/sources/sinks): CSV, JSON-lines, and text,
  * with explicit-schema reads so ingestion never depends on schema
  * inference (at 100 TB an inference pass is a full extra scan —
  * always ship the schema).
  */
object Formats {

  // escape = `"` on both sides: RFC 4180 doubled-quote escaping, so
  // the files interchange with every standard CSV reader (Spark's
  // default backslash escape is a Spark-ism); multiLine on read so
  // quoted embedded newlines parse as field content, not row breaks —
  // note multiLine makes the FILE the split unit, so writer
  // parallelism (one file per partition) is the reader's parallelism
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(path)

  /** Gzipped JSONL (`.json.gz`) — the most common corpus wire format.
    * Written through Spark's codec chain; read back via extension-
    * based codec inference (no reader changes needed). */
  def writeJsonlGz(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .option("compression", "gzip")
      .json(path)

  /** Bzip2'd JSONL — the one stock-Hadoop compressed text codec that
    * is SPLITTABLE (block-structured with a findable block magic, so
    * TextInputFormat can start mid-file), and therefore the scale-out
    * answer to gzip's one-task-per-file ceiling. Pure-JVM codec in
    * hadoop-common — no native lib. */
  def writeJsonlBz2(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .option("compression", "bzip2")
      .json(path)

  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Parquet with an explicit codec — zstd for cold storage (best
    * ratio), snappy/lz4 for hot paths; at 100 TB the codec choice is
    * a double-digit-percent storage and scan-time decision. */
  def writeParquet(df: DataFrame, path: String, codec: String = "zstd"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      .parquet(path)
}
