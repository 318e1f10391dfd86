package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed projection of a lineitem row — only the columns the
  * aggregation touches, so the Encoder's deserializer doubles as
  * column pruning. */
final case class LineitemSlim(
    l_returnflag: String,
    l_extendedprice: Double,
    l_discount: Double)

/** The typed `Dataset[T]` face of the engine (SURVEY §2.3 UDF/API
  * surface): everything else is Column/SQL-based; this exercises the
  * remaining API a Scala user reaches for when compile-time safety
  * matters — case-class Encoders, `groupByKey`, and a custom
  * [[Aggregator]] with an explicit buffer Encoder.
  *
  * The Aggregator reproduces [[OpsUtil.dsum]]'s exact-revenue
  * contract in JVM land: each double revenue quantizes through
  * `BigDecimal.valueOf(v).setScale(6, HALF_UP)` — the same canonical
  * double→string→decimal path Catalyst's `CAST(x AS DECIMAL(18,6))`
  * takes — so partial sums are exact, merge order can't move the
  * result, and the output is bit-identical to the SQL formulation in
  * BOTH engines. Plan cost, stated honestly: a typed Aggregator runs
  * outside whole-stage codegen (the lambda is opaque to Catalyst) and
  * pays serialization at the boundary — the Column twin (`dsum`) is
  * the hot-path form; this query exists because the typed API is
  * real user surface, and the hash gate proves the two agree. */
object TypedOps {

  /** (exact decimal revenue sum, row count) with an explicit tuple
    * buffer Encoder — no Kryo, so the shuffle format stays stable. */
  object RevenueAgg extends Aggregator[LineitemSlim, (JBigDecimal, Long), (Double, Long)] {
    override def zero: (JBigDecimal, Long) = (JBigDecimal.ZERO, 0L)
    override def reduce(b: (JBigDecimal, Long), r: LineitemSlim): (JBigDecimal, Long) = {
      val rev = JBigDecimal.valueOf(r.l_extendedprice * (1.0 - r.l_discount))
        .setScale(6, RoundingMode.HALF_UP)
      (b._1.add(rev), b._2 + 1)
    }
    override def merge(a: (JBigDecimal, Long), b: (JBigDecimal, Long)): (JBigDecimal, Long) =
      (a._1.add(b._1), a._2 + b._2)
    override def finish(b: (JBigDecimal, Long)): (Double, Long) =
      (b._1.doubleValue, b._2)
    override def bufferEncoder: Encoder[(JBigDecimal, Long)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  }

  /** Declared query `agg_typed`: revenue per return flag through
    * `Dataset[LineitemSlim].groupByKey(...).agg(custom Aggregator)`. */
  def typedRevenue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"))
      .as[LineitemSlim]
      .groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("rev_n"))
      .select(col("key").as("l_returnflag"),
        col("rev_n._1").as("revenue"),
        col("rev_n._2").as("n_items"))
      .orderBy("l_returnflag")
  }

  def typedRevenueSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
