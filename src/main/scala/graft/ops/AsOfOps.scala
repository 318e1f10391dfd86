package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (temporal) join — an operator Spark lacks natively.
  *
  * Implementation is the scalable union-and-carry pattern rather than
  * a range join: tag left and right rows, sort each key's timeline
  * once, and carry the latest right payload forward with a running
  * `last(ignoreNulls)` window. One shuffle on the key, one sort — no
  * O(|L|·|R|) range-join blowup, no per-row probe; this is the shape
  * that survives 100 TB timelines. Tie rule matches DuckDB's ASOF
  * (inclusive: a right row at exactly the left timestamp matches), so
  * the oracle uses DuckDB's native ASOF LEFT JOIN.
  */
object AsOfOps {

  /** Left as-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` on the same key. Right payload columns come
    * back null when no prior right row exists.
    *
    * `tieBreak` (a right column, e.g. an event id) makes the pick
    * among right rows sharing the same (key, ts) deterministic: the
    * row with the LARGEST tieBreak value wins. Without it, two right
    * rows at the same timestamp make `last()` partitioning-dependent
    * — invisible at one SF, a hash mismatch at another. */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = right
      .select(struct(rightPayload.map(col): _*).as("p")).schema("p").dataType
    val tieType = tieBreak.map(t => right.schema(t).dataType)
      .getOrElse(org.apache.spark.sql.types.IntegerType)
    val l = left.select((leftCols.map(col) :+ lit(1).as("__side")
      :+ lit(null).cast(payloadType).as("__payload")
      :+ lit(null).cast(tieType).as("__tie")): _*)
    val r = right.select(col(key), col(ts), lit(0).as("__side"),
      struct(rightPayload.map(col): _*).as("__payload"),
      tieBreak.map(col).getOrElse(lit(null).cast(tieType)).as("__tie"))
    // align schemas: left keeps all its columns; right contributes
    // only key/ts/payload with nulls elsewhere
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) :+ col("__side") :+ col("__payload")
      :+ col("__tie")): _*)
    val union = l.unionByName(rAligned)
    // at equal ts, right rows (side 0) sort first → visible to the
    // left row's window = inclusive as-of, DuckDB's default; among
    // tied right rows, ascending __tie means last() picks the max
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    union
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", "__payload", "__tie")
  }

  /** Declared query: for every non-purchase event, the same user's
    * most recent purchase at or before the event. */
  def eventAsOfPurchase(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val nonPurchase = ev.where(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    leftAsOf(nonPurchase, purchases, "user_id", "ts",
        Seq("event_id", "value", "ts"), tieBreak = Some("event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"),
        col("__asof.event_id").as("purchase_event_id"),
        col("__asof.value").as("purchase_value"),
        unix_millis(col("__asof.ts")).as("purchase_ts_ms"))
      .orderBy("event_id")
  }

  // the right side is deduped to the max-event_id purchase per
  // (user_id, ts) before the ASOF — DuckDB's ASOF pick among tied
  // timestamps is unspecified, and the Spark window's tie-break
  // (ascending event_id, last() wins) selects exactly that row
  def eventAsOfPurchaseSql: String =
    """SELECT e.event_id, e.user_id, e.event_type, epoch_ms(e.ts) AS ts_ms,
      |  p.event_id AS purchase_event_id,
      |  p.value AS purchase_value,
      |  epoch_ms(p.ts) AS purchase_ts_ms
      |FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
      |ASOF LEFT JOIN
      |  (SELECT user_id, ts, event_id, value FROM events
      |   WHERE event_type = 'purchase'
      |   QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |                              ORDER BY event_id DESC) = 1) p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id""".stripMargin
}
