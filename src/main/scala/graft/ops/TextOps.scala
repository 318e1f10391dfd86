package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.OpsUtil._

/** The reference's own workloads (word count, grep — see SURVEY.md §2.2,
  * /root/reference/tests/testdata/exec/) re-expressed relationally over
  * `documents.text`, plus distinct/projection shapes.
  *
  * Scale notes: tokenization is a generate (explode) — it pipelines
  * inside whole-stage codegen with the parquet scan, no shuffle until
  * the aggregation. The aggregation is hash-based with map-side
  * partial aggregation, so the shuffle carries one row per (partition,
  * word), not one per token — at 100 TB the shuffle volume is bounded
  * by |vocabulary| × partitions, not corpus size.
  */
object TextOps {

  /** Q1/Q2 (wc_map/wc_reduce): word count over the corpus.
    * explode_outer + isNotNull instead of explode: plain explode makes
    * the optimizer infer `size(...) > 0` and push it below the
    * projection, re-running tokens(text) per row in the filter; the
    * outer variant infers nothing and the null filter on the OUTPUT
    * attribute is cheap. Identical rows, ~half the tokenize work. */
  def wordCount(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode_outer(tokens(col("text"))).as("word"))
      .where(col("word").isNotNull)
      .groupBy("word").agg(count("*").as("cnt"))
      .orderBy("word")

  def wordCountSql: String =
    """SELECT t.word AS word, count(*) AS cnt
      |FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                tok -> tok <> '')) AS word
      |      FROM documents) t
      |GROUP BY t.word ORDER BY t.word""".stripMargin

  /** Q5/Q6 (grep_map/grep_reduce): case-insensitive substring filter +
    * projection. The reference's default query is "product"
    * (grep_map.py:14-15); over `documents` we grep for "spark", a term
    * present in the synthetic vocabulary. Predicate + projection both
    * push to the parquet scan. */
  def grep(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .filter(lower(col("text")).contains("spark"))
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")

  def grepSql: String =
    """SELECT doc_id, text FROM documents
      |WHERE contains(lower(text), 'spark') ORDER BY doc_id""".stripMargin

  /** Distinct (dropDuplicates as a relational op): the corpus
    * vocabulary per language. */
  def distinctTokens(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("lang"), explode_outer(tokens(col("text"))).as("word"))
      .where(col("word").isNotNull) // see wordCount: avoids tokens() re-eval in an inferred pushed filter
      .distinct()
      .orderBy("lang", "word")

  def distinctTokensSql: String =
    """SELECT DISTINCT lang, t.word AS word
      |FROM (SELECT lang,
      |             unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                tok -> tok <> '')) AS word
      |      FROM documents) t
      |ORDER BY lang, t.word""".stripMargin
}
