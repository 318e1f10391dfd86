package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom aggregate function (TypedImperativeAggregate — the mutable-
  * buffer shape used for sketches): a K-function MinHash signature of
  * a group's set of hashed elements.
  *
  * Buffer = K running minima under the universal family
  * h_j(x) = (A_j·x + B_j) mod P — the same family and constants as
  * DedupOps, so a DuckDB oracle can reproduce each signature slot
  * with a plain MIN aggregate. Merging two buffers is elementwise
  * min, which makes the aggregate algebraic: partial signatures
  * combine map-side exactly like sums do, so the shuffle carries K
  * longs per group regardless of group size — the whole point of
  * sketch aggregates at 100 TB.
  */
case class MinHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import MinHashSigAgg._

  override def createAggregationBuffer(): Array[Long] = Array.fill(K)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < K) {
        val h = (As(j) * (x % P) + Bs(j)) % P
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < K) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(K * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(K)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "minhash_sig"
}

object MinHashSigAgg {
  // Shared with DedupOps' MinHash family (same constants → oracles
  // can recompute any signature slot with MIN((A_j*x+B_j)%P)).
  val K = 12
  val P = 1000000007L
  val As: Array[Long] = Array(1000003L, 1000033L, 1000037L, 1000039L, 1000081L,
    1000099L, 1000117L, 1000121L, 1000133L, 1000151L, 1000159L, 1000171L)
  val Bs: Array[Long] = Array(15485863L, 15485867L, 15485917L, 15485927L, 15485933L,
    15485941L, 15485959L, 15485989L, 15485993L, 15486013L, 15486041L, 15486047L)

  /** Column API: MinHash signature (array<long> of K minima) of a
    * group's hashed elements (non-negative longs). */
  def minhash_sig(hashed: Column): Column =
    Bridge.toColumn(MinHashSigAgg(Bridge.toExpression(hashed))
      .toAggregateExpression())
}
