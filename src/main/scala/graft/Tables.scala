package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All declared queries read through here so that scan-level concerns
  * (schema, pushdown, pruning) live in one place. At 100 TB these
  * parquet directories would be partitioned (e.g. orders/lineitem by
  * date); `spark.read.parquet` picks up partition pruning + predicate
  * pushdown automatically as long as callers express filters on the
  * DataFrame (never collect-then-filter).
  */
object Tables {
  // Parquet schema inference launches a (small) Spark job per
  // spark.read.parquet call; queries construct the same scans over and
  // over (bench warmup + passes, 50 declared queries), so the inferred
  // schema is cached per path and handed to subsequent reads
  // explicitly — construction of a declared query then runs ZERO jobs
  // (asserted for the IVF build/probe in PlanSpec). At 100 TB the
  // equivalent is a catalog/metastore schema, never per-query
  // inference.
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  /** `events.ts` arrives in whatever physical type the generator of
    * the day produced; normalize to session-local TimestampType so
    * downstream `unix_millis`/window math always sees one type:
    *  - TIMESTAMP(NANOS) parquet → Spark reads a nanosecond long
    *    (spark.sql.legacy.parquet.nanosAsLong=true in Verify/Bench/
    *    test sessions); integer-divide to µs — ns epoch values
    *    (~1.7e18) exceed double's exact-integer range, so `div`.
    *  - timestamp[us] without tz (current generator) → TIMESTAMP_NTZ
    *    under inferTimestampNTZ; cast to LTZ is instant-preserving
    *    because every driver session pins spark.sql.session.timeZone
    *    to UTC, matching DuckDB's naive-UTC read of the same file. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  /** documents/embeddings fan out to the session's core count right
    * after the scan (r16 opt, guide §2.5; [[graft.ops.OpsUtil.fanOut]]
    * scaladoc has the full stance): the sf fixtures are
    * single-row-group parquet, so every corpus scan is ONE task and
    * every tokenize/shingle/vector kernel — the dominant CPU of the
    * text, dedup, similarity and curation families — serialized on one
    * core. fanOut is a no-op whenever the scan already splits to ≥
    * default parallelism (any real table at scale), so production
    * plans never pay the extra exchange; locally it costs one ~MB-ish
    * round-robin shuffle and unlocks the other 31 cores. Results are
    * partitioning-independent (every declared query aggregates or
    * sorts; the 287-query oracle gate pins it). */
  def documents(spark: SparkSession, d: String): DataFrame =
    graft.ops.OpsUtil.fanOut(table(spark, d, "documents"))
  def embeddings(spark: SparkSession, d: String): DataFrame =
    graft.ops.OpsUtil.fanOut(table(spark, d, "embeddings"))
}
