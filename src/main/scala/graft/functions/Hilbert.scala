package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-16 HILBERT curve index over a 65536×65536 grid — the
  * multi-dimensional clustering key Databricks moved to after Z-order
  * (liquid clustering) because Hilbert's defining property is what
  * min/max file pruning actually wants: every unit step along the
  * curve is a UNIT step in the grid (proved exhaustively by
  * HilbertProps), so a contiguous run of curve positions — one file —
  * is a tight connected blob, where Z-order's worst-case seam jumps
  * half the plane and fattens a file's bounding box.
  *
  * Unlike the Morton interleave ([[graft.ops.ScaleOps.zorder16]],
  * a flat per-bit OR-fold), the Hilbert walk carries rotation STATE
  * across bit levels — as a Column fold the (x,y) terms double per
  * level into a 2^16-node expression tree, which is exactly the case
  * for a custom codegen'd Expression: one 16-iteration Java loop in
  * generated code (whole-stage friendly), an interpreted eval calling
  * the identical scalar, and the DuckDB oracle replays the walk as 16
  * chained CTE steps so the state machine itself is cross-checked.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expected (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.index(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Hilbert.index($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert16"
}

object Hilbert {

  /** Order of the curve: 16 bits per coordinate. */
  val Order = 16
  private val N = 1L << Order // 65536

  /** xy→d, the standard iterative walk (Wikipedia/Hacker's Delight
    * form): top bit level down, quadrant digit = gray-coded (rx, ry),
    * then reflect+swap the LOWER bits into the sub-curve's frame.
    * Coordinates are taken mod 2^16 by the CALLER (same contract as
    * zorder16); out-of-range bits here would silently alias. */
  def index(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = N >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** d→(x,y), the inverse walk — test-side only (round-trip and
    * unit-step adjacency proofs in HilbertProps). */
  def pos(d0: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Column API over two bigint coordinates in [0, 65536). */
  def hilbert16(x: Column, y: Column): Column =
    Bridge.toColumn(HilbertIndexExpr(Bridge.toExpression(x), Bridge.toExpression(y)))
}
