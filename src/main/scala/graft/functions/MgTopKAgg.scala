package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a TypedImperativeAggregate —
  * the second sketch aggregate (after [[MinHashSigAgg]]), covering
  * the "frequent items without a full groupBy" slot: K counters per
  * GROUP, partial-merged map-side, so the shuffle carries ≤ K
  * (token, count) entries + one error bound per group no matter how
  * many distinct tokens the group holds.
  *
  * State: up to [[MgTopKAgg.K]] under-estimate counters plus a global
  * error bound `err`. Update is classic MG (hit → +1; room → insert;
  * full → decrement all, dropping zeros, err += 1). Merge is the
  * mergeable-summaries rule (Agarwal et al., PODS'12): sum counters,
  * and if over K, subtract the (K+1)-th largest count from all,
  * drop ≤ 0, err += that count.
  *
  * The COUNTER VALUES (and which near-tied items survive) depend on
  * the merge tree, i.e. on partitioning — so queries must never
  * declare raw sketch contents. What IS partition-independent is the
  * pair of guarantees, which hold for every valid MG state:
  *   est(x) ≤ true(x) ≤ est(x) + err          (bounds)
  *   true(x) > err ⇒ x is present (est > 0)   (heavy-hitter recall)
  * Declared queries score the sketch in-query against exact
  * companions (the `agg_approx` pattern): the flags are
  * deterministically TRUE iff the implementation upholds the
  * guarantees under whatever partial/merge schedule ran.
  */
case class MgTopKAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgTopKAgg.State] {

  import MgTopKAgg._

  // analysis-time typing like the framework's other expressions
  // (Xhash60Expr style): a non-string child is rejected during
  // analysis instead of ClassCastException-ing on UTF8String at
  // execution
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_topk expects a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): State = new State(mutable.HashMap.empty, 0L)

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.counts.get(t) match {
        case Some(c) => buf.counts.update(t, c + 1)
        case None if buf.counts.size < K => buf.counts.update(t, 1L)
        case None =>
          // decrement-all: every tracked counter and the incoming item
          // lose one occurrence; zeros drop out
          buf.err += 1
          val dead = buf.counts.collect { case (k, 1L) => k }
          buf.counts.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  override def merge(a: State, b: State): State = {
    b.counts.foreach { case (t, c) =>
      a.counts.update(t, a.counts.getOrElse(t, 0L) + c)
    }
    a.err += b.err
    if (a.counts.size > K) {
      // subtract the (K+1)-th largest count (ties irrelevant: the
      // subtrahend is a VALUE, removal is by resulting non-positivity)
      val d = a.counts.values.toArray.sorted(Ordering[Long].reverse).apply(K)
      a.err += d
      val dead = a.counts.collect { case (k, c) if c <= d => k }
      a.counts.mapValuesInPlace((_, c) => c - d)
      dead.foreach(a.counts.remove)
    }
    a
  }

  override def eval(buf: State): Any = {
    // deterministic key order inside the map value (not that declared
    // queries may expose it — but debuggability is free)
    val entries = buf.counts.toSeq.sortBy(_._1)
    new GenericInternalRow(Array[Any](
      buf.err,
      ArrayBasedMapData(
        entries.map(e => UTF8String.fromString(e._1)).toArray[Any],
        entries.map(_._2).toArray[Any])))
  }

  override def serialize(buf: State): Array[Byte] = {
    val items = buf.counts.toSeq
    val bytes = items.map(_._1.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.allocate(
      8 + 4 + bytes.map(b => 4 + b.length + 8).sum)
    bb.putLong(buf.err)
    bb.putInt(items.size)
    items.zip(bytes).foreach { case ((_, c), tb) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val err = bb.getLong
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      m.update(new String(tb, "UTF-8"), bb.getLong)
      i += 1
    }
    new State(m, err)
  }

  override def dataType: DataType = MgTopKAgg.OutType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgTopKAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "mg_topk"
}

object MgTopKAgg {
  /** Counter budget: guarantees err ≤ N/(K+1) per group (N = group's
    * token count), i.e. every token above that mass is tracked. */
  val K = 32

  final class State(val counts: mutable.HashMap[String, Long], var err: Long)

  val OutType: StructType = StructType(Seq(
    StructField("err", LongType, nullable = false),
    StructField("counts", MapType(StringType, LongType, valueContainsNull = false),
      nullable = false)))

  /** Column API: MG heavy-hitter sketch of a group's string column →
    * struct(err, counts map). */
  def mg_topk(token: Column): Column =
    Bridge.toColumn(MgTopKAgg(Bridge.toExpression(token)).toAggregateExpression())
}
