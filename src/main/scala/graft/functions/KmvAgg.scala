package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the distinct-counting slot between exact
  * `countDistinct` (full shuffle of every distinct value) and HLL
  * (`agg_hll_merge`): per GROUP the state is the K smallest DISTINCT
  * hash values, so the shuffle carries ≤ K longs per group no matter
  * how many distinct values the group holds, and the estimate
  * (k−1)·2⁶⁰ / h₍ₖ₎ is within ~1/√K relative error for uniform
  * hashes (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07).
  *
  * Unlike HLL (whose register contents depend on implementation
  * constants), the KMV state is a pure ORDER STATISTIC of the hash
  * set: the K smallest distinct values of a deterministic hash are the
  * same no matter how the data is partitioned or merged — so the raw
  * sketch output (kth hash, estimate) is itself declared-query-safe
  * and the DuckDB oracle replays it exactly with a rank-K window over
  * the same md5-derived [[Xhash60]] both engines compute identically.
  *
  * Input: a LongType hash column in [0, 2⁶⁰) — hash FIRST (codegen'd
  * Xhash60), sketch the hashes; the aggregate does no hashing of its
  * own. Update: bounded sorted-set insert (skip if ≥ current max when
  * full). Merge: set union, truncate to K smallest — associative and
  * commutative, so map-side partial aggregation applies.
  *
  * Eval emits struct(n_held, kth_hash, est_distinct): below K distinct
  * the sketch IS the exact distinct set (est = n_held, kth null);
  * at K the estimate divides exactly in BigInt so the result is
  * bit-identical to the oracle's HUGEINT division.
  */
case class KmvAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  import KmvAgg._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv expects a bigint hash column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < K) buf.add(h)
      else if (h < buf.last && !buf.contains(h)) { buf.add(h); buf.remove(buf.last) }
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    a.addAll(b)
    while (a.size > K) a.remove(a.last)
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    // retained hashes ship in the result so downstream SKETCH ALGEBRA
    // (union = merge, difference = agg_kmv_diff's a-not-b) can run on
    // the K-bounded state without touching the corpus again
    val hashes = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      buf.toArray[Long])
    if (buf.size < K)
      new GenericInternalRow(Array[Any](buf.size.toLong, null, buf.size.toLong, hashes))
    else {
      val kth = buf.last
      // exact integer math: (K-1)·2^60 overflows a signed 64-bit long
      // (63·2^60 ≈ 7.3e19), so divide in BigInt like the oracle's HUGEINT
      val est = (BigInt(K - 1) * (BigInt(1) << 60) / BigInt(kth)).toLong
      new GenericInternalRow(Array[Any](buf.size.toLong, kth, est, hashes))
    }
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = KmvAgg.OutType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kmv_distinct"
}

object KmvAgg {
  /** Sketch size: ~1/√32 ≈ 18% worst-case relative error, 256 bytes of
    * state per group. Production would use 256–1024; 32 keeps the
    * below-K exact path reachable at small SF. */
  val K = 32

  val OutType: StructType = StructType(Seq(
    StructField("n_held", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true),
    StructField("est_distinct", LongType, nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Column API: KMV distinct sketch of a group's hash column →
    * struct(n_held, kth_hash, est_distinct). */
  def kmv_distinct(hash: Column): Column =
    Bridge.toColumn(KmvAgg(Bridge.toExpression(hash)).toAggregateExpression())
}
