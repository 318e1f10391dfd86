package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd cross-engine 60-bit hash — the hot-path form of
  * [[graft.ops.OpsUtil.xhash60]]'s original composite
  * `conv(substring(md5(concat("<salt>:", s)), 1, 15), 16, 10)`:
  * one MD5 over the same bytes, then the first 15 hex digits read
  * DIRECTLY from the digest (bytes 0-6 plus the high nibble of byte
  * 7) — no 32-char hex string, no substring, no base-16 string parse
  * per call. Bit-identical to the composite (Xhash60Spec proves it
  * value-for-value incl. unicode), so every DuckDB oracle mirror
  * ([[graft.ops.OpsUtil.xhash60Sql]]) is unchanged. This primitive
  * runs once per shingle/token across the dedup/text family — at
  * corpus scale the two avoided string allocations per call are the
  * dominant cost of the signature build.
  */
case class Xhash60Expr(child: Expression, salt: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Xhash60.hash(input.asInstanceOf[UTF8String], salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Xhash60.hash($c, $salt)")

  override protected def withNewChildInternal(newChild: Expression): Xhash60Expr =
    copy(child = newChild)

  override def prettyName: String = "xhash60"
}

object Xhash60 {
  private val mdPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val saltPrefix =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Byte]]()

  /** md5("<salt>:" + s) truncated to its first 15 hex digits as a
    * non-negative long (UTF-8 of a concat == concat of UTF-8, so
    * hashing prefix bytes then string bytes matches the composite). */
  def hash(s: UTF8String, salt: Int): Long = {
    val md = mdPool.get()
    md.reset()
    md.update(saltPrefix.computeIfAbsent(salt, k => s"$k:".getBytes("UTF-8")))
    md.update(s.getBytes)
    val d = md.digest()
    // hex chars 0..14 = bytes 0..6 in full + the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Column API, drop-in for the composite form. */
  def xhash60(c: Column, salt: Int): Column =
    Bridge.toColumn(Xhash60Expr(Bridge.toExpression(c), salt))
}
