package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-document character-trigram statistics:
  * `(n_trigrams, n_distinct, entropy)` in ONE pass over the string —
  * the fused form of explode-every-trigram → groupBy(doc, tri) →
  * groupBy(doc), which shuffles ~70× the document count twice.
  * The [[SimHash60]] precedent: same aggregation semantics, zero
  * shuffle (the only remaining exchange in `text_char_entropy` is the
  * final orderBy over one row per document).
  *
  * Exactness contract (the DuckDB oracle replays the decimal-
  * quantized pipeline): each trigram count's `c·ln(c)` is rounded
  * HALF_UP to 12 decimals exactly as Spark's `round(double, 12)`
  * does (`BigDecimal.valueOf` → `setScale` → the 12-decimal value is
  * ≤15 significant digits, so the double round-trip Spark's
  * decimal(28,12) cast takes is lossless), summed as exact decimal,
  * and the final entropy rounds HALF_UP to 9. Trigrams are counted
  * over Unicode CODE POINTS (Spark `substr`/DuckDB `substr`
  * semantics), keyed as three 21-bit codepoints packed in a Long —
  * no per-trigram string materializes. */
case class TrigramStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected string, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TrigramStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TrigramStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): TrigramStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "trigram_stats"
}

object TrigramStats {

  /** Column API: struct(n_trigrams, n_distinct, entropy) of the
    * character trigrams of `text` (callers lowercase upstream). */
  def trigramStats(text: Column): Column =
    Bridge.toColumn(TrigramStatsExpr(Bridge.toExpression(text)))

  /** One-pass histogram + entropy. Called from generated code — keep
    * the signature static-forwarder-friendly (UTF8String in,
    * InternalRow out). */
  def compute(input: UTF8String): InternalRow = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    val total = math.max(n - 2, 0)
    if (total == 0) {
      return new GenericInternalRow(Array[Any](0L, 0L, 0.0))
    }
    val counts = new java.util.HashMap[java.lang.Long, Array[Int]](256)
    var i = 0
    while (i <= n - 3) {
      // three ≤21-bit codepoints pack a unique 63-bit key — no
      // trigram string is ever materialized
      val key: java.lang.Long =
        cps(i).toLong | (cps(i + 1).toLong << 21) | (cps(i + 2).toLong << 42)
      val slot = counts.get(key)
      if (slot == null) counts.put(key, Array(1)) else slot(0) += 1
      i += 1
    }
    var acc = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      // == Spark round(c*ln(c), 12) then cast decimal(28,12): the
      // 12-scale value has ≤15 significant digits, so Spark's
      // intermediate toDouble/valueOf round-trip is lossless and
      // accumulating the setScale result directly is bit-identical
      acc = acc.add(
        java.math.BigDecimal.valueOf(c * math.log(c)).setScale(12, RoundingMode.HALF_UP))
    }
    val clnc = acc.doubleValue()
    val entropy = java.math.BigDecimal
      .valueOf(math.log(total.toDouble) - clnc / total.toDouble)
      .setScale(9, RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](total.toLong, counts.size().toLong, entropy))
  }
}
