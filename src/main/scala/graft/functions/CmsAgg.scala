package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a TypedImperativeAggregate — the third sketch
  * aggregate (after [[MinHashSigAgg]] and [[MgTopKAgg]]), covering
  * the "approximate frequencies of EVERYTHING without a per-item
  * groupBy" slot: a fixed [[CmsAgg.D]]×[[CmsAgg.W]] counter grid per
  * GROUP, so the shuffle carries D·W longs per group no matter how
  * many distinct items the group holds, and est(x) ≥ true(x) always
  * (one-sided error ≤ Σcounts·e/W at the usual analysis).
  *
  * Unlike Misra–Gries, the CMS state is PARTITION-INDEPENDENT: update
  * is counter increments and merge is elementwise addition — exact
  * commutative sums — so the final grid (and therefore every
  * estimate) is bit-identical under any partial/merge schedule, and
  * declared queries can expose raw estimates directly under the hash
  * gate. The row hashes are md5-derived — ONE md5(item) per item,
  * row r reading hex digits [8r, 8r+8) mod W (md5's four 32-bit
  * words are independent) — a construction a DuckDB oracle replays
  * verbatim with its own md5(): the [[MinHashSigAgg]] replayability
  * principle applied to a different summary.
  */
case class CmsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CmsAgg._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bs = buckets(v.asInstanceOf[UTF8String].toString)
      var r = 0
      while (r < D) {
        buf(r * W + bs(r)) += 1
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(D * W * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(D * W)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(DataTypes.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "cms_sketch"
}

object CmsAgg {
  /** Grid shape: D independent md5-derived rows × W buckets. W = 64
    * keeps the per-group state at 2 KiB (512 longs would be the next
    * power if tighter error were needed; the declared queries carry
    * the exact companion counts, so W tunes error, not correctness). */
  val D = 4
  val W = 64

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** All D buckets of an item from ONE md5: row r reads the digest's
    * r-th big-endian 32-bit word mod W — replayable in DuckDB as
    * `('0x' || substr(md5(item), 8*r + 1, 8))::BIGINT % W`. */
  def buckets(item: String): Array[Int] = {
    val md = digest.get()
    md.reset()
    val d = md.digest(item.getBytes("UTF-8"))
    Array.tabulate(D) { r =>
      val w = ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
        ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
      (w % W).toInt
    }
  }

  /** Column API: Count-Min sketch of a group's string column →
    * array<long> of D·W row-major counters. */
  def cms_sketch(item: Column): Column =
    Bridge.toColumn(CmsAgg(Bridge.toExpression(item)).toAggregateExpression())
}
