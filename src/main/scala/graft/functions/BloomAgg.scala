package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a TypedImperativeAggregate — the membership sketch
  * next to the frequency ([[CmsAgg]]), top-k ([[MgTopKAgg]]) and
  * cardinality ([[KmvAgg]]) ones: a fixed [[BloomAgg.M]]-bit array per
  * GROUP (16 longs), updated by setting [[BloomAgg.K]] md5-derived
  * bits per element and merged by bitwise OR — an idempotent,
  * commutative union, so the final bit set (and its popcount) is
  * bit-identical under any partial/merge schedule and the declared
  * face goes under the driver's hash gate directly.
  *
  * The K bit positions come from ONE md5 per element (position k
  * reads hex digits [8k, 8k+8) mod M — the [[CmsAgg.buckets]]
  * construction with a different modulus), so a DuckDB oracle replays
  * the entire filter: the set-bit count is exactly
  * `COUNT(DISTINCT position)` over elements × k. The popcount feeds
  * the two standard bloom diagnostics — the cardinality estimate
  * −(M/K)·ln(1 − bits/M) (the "swamidass–baldi" inversion of the
  * expected fill) and the current false-positive rate (bits/M)^K.
  *
  * At 100 TB the filter IS the join-pruning asset: 16 longs per group
  * crosses the shuffle instead of the distinct element set, and
  * membership tests on the merged filter replace an existence join
  * (the plan-level analog, Spark's own InjectRuntimeFilter bloom, is
  * exercised by `join_bloom` — this is the USER-level mergeable
  * sketch).
  */
case class BloomAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import BloomAgg._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits expects a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](M / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val ps = positions(v.asInstanceOf[UTF8String].toString)
      var k = 0
      while (k < K) {
        val p = ps(k)
        buf(p >>> 6) |= (1L << (p & 63))
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  /** Popcount of the merged filter — the one scalar every bloom
    * diagnostic derives from, and the value the oracle replays as
    * COUNT(DISTINCT position). */
  override def eval(buf: Array[Long]): Any = {
    var bits = 0L
    var i = 0
    while (i < buf.length) { bits += java.lang.Long.bitCount(buf(i)); i += 1 }
    bits
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(M / 64)(bb.getLong)
  }

  override def dataType: DataType = DataTypes.LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_bits"
}

object BloomAgg {
  /** M = 1024 bits (16 longs/group of shuffle state), K = 3 hashes —
    * sized so the driver corpus part-fills the filter (a saturated
    * filter's diagnostics are all 1.0 and test nothing; the declared
    * query carries the exact distinct count alongside for scoring). */
  val M = 1024
  val K = 3

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** K bit positions from ONE md5: position k reads the digest's k-th
    * big-endian 32-bit word mod M — replayable in DuckDB as
    * `('0x' || substr(md5(item), 8*k + 1, 8))::BIGINT % M`. */
  def positions(item: String): Array[Int] = {
    val md = digest.get()
    md.reset()
    val d = md.digest(item.getBytes("UTF-8"))
    Array.tabulate(K) { k =>
      val w = ((d(4 * k) & 0xffL) << 24) | ((d(4 * k + 1) & 0xffL) << 16) |
        ((d(4 * k + 2) & 0xffL) << 8) | (d(4 * k + 3) & 0xffL)
      (w % M).toInt
    }
  }

  /** Column API: bloom-filter popcount of a group's string column. */
  def bloom_bits(item: Column): Column =
    Bridge.toColumn(BloomAgg(Bridge.toExpression(item)).toAggregateExpression())
}
