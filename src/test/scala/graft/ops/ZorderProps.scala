package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The column-fold [[ScaleOps.zorder16]] must place bits exactly
  * where an independent scalar Morton encode puts them — the DuckDB
  * oracle checks this on the declared slice, this pins it across the
  * full 16-bit × 16-bit domain (corners, random interior, and the
  * monotone-in-each-dimension quadrant property the quadtree pruning
  * argument rests on).
  */
class ZorderProps extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Reference scalar Morton interleave, written independently of the
    * Column fold (loop over bits, no Spark). */
  private def morton(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("matches the scalar reference on corners and random interior points") {
    import spark.implicits._
    val corner = Seq(0L, 1L, 2L, 3L, 32767L, 32768L, 65534L, 65535L)
    val randPair = for {
      x <- Gen.chooseNum(0L, 65535L)
      y <- Gen.chooseNum(0L, 65535L)
    } yield (x, y)
    val pairs = (for (x <- corner; y <- corner) yield (x, y)) ++
      Gen.listOfN(500, randPair)
        .apply(Gen.Parameters.default, Seed(77L)).getOrElse(Nil)
    assert(pairs.size === corner.size * corner.size + 500)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ScaleOps.zorder16(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === morton(x, y), s"($x, $y)")
    }
  }

  test("quadrant property: high bits of z are the quadrant of (x, y)") {
    // The pruning argument: the top 2 bits of z identify which half of
    // each dimension the point is in, recursively — so contiguous
    // z-ranges are quadtree cells. Checked at the top level for all
    // four quadrants.
    import spark.implicits._
    val pts = Seq(
      (100L, 200L), (40000L, 300L), (123L, 50000L), (60000L, 40000L))
    val z = pts.toDF("x", "y")
      .select(ScaleOps.zorder16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val quadrant = z.map(v => ((v >> 31) & 1L, (v >> 30) & 1L)) // (yHigh, xHigh)
    assert(quadrant.toSeq === Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
  }
}
