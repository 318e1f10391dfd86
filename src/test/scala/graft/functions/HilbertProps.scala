package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The Hilbert walk's contract: a bijection on the 2^16×2^16 grid
  * whose consecutive positions are always UNIT grid steps — the
  * locality property the layout_hilbert clustering argument rests on
  * (and the one Z-order lacks: its seams jump half the plane).
  */
class HilbertProps extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sample[A](n: Int, g: Gen[A], seed: Long): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  test("index/pos round-trip on corners and random interior points") {
    val corner = Seq(0L, 1L, 32767L, 32768L, 65534L, 65535L)
    val randPair = for {
      x <- Gen.chooseNum(0L, 65535L)
      y <- Gen.chooseNum(0L, 65535L)
    } yield (x, y)
    val pairs = (for (x <- corner; y <- corner) yield (x, y)) ++
      sample(1000, randPair, 101L)
    pairs.foreach { case (x, y) =>
      val d = Hilbert.index(x, y)
      assert(0L <= d && d < (1L << 32), s"($x,$y) -> $d out of range")
      assert(Hilbert.pos(d) == ((x, y)), s"pos(index($x,$y)) diverged")
    }
  }

  test("unit-step adjacency: consecutive curve positions are grid neighbors") {
    // random windows across the full 2^32 walk + the endpoints
    val ds = sample(2000, Gen.chooseNum(0L, (1L << 32) - 2), 202L) ++
      Seq(0L, (1L << 32) - 2)
    ds.foreach { d =>
      val (x1, y1) = Hilbert.pos(d)
      val (x2, y2) = Hilbert.pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} jumped from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("exhaustive order-6 sweep: bijection + adjacency over the whole sub-grid") {
    // the first 4^6 curve positions tile exactly the 64×64 corner of
    // the grid (Hilbert nesting), so a full sweep is cheap and total
    val n = 1L << 12
    val seen = new Array[Boolean](1 << 12)
    var prev: (Long, Long) = null
    (0L until n).foreach { d =>
      val (x, y) = Hilbert.pos(d)
      assert(x < 64 && y < 64, s"pos($d)=($x,$y) escaped the 64x64 tile")
      val k = (x * 64 + y).toInt
      assert(!seen(k), s"pos($d) revisits ($x,$y)")
      seen(k) = true
      assert(Hilbert.index(x, y) == d, s"index(pos($d)) != $d")
      if (prev != null)
        assert(math.abs(x - prev._1) + math.abs(y - prev._2) == 1, s"seam at $d")
      prev = (x, y)
    }
    assert(seen.forall(identity), "some cell never visited")
  }

  test("codegen'd expression matches the scalar on a DataFrame") {
    import spark.implicits._
    val pairs = sample(300, for {
      x <- Gen.chooseNum(0L, 65535L)
      y <- Gen.chooseNum(0L, 65535L)
    } yield (x, y), 303L)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hilbert16(col("x"), col("y")).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == Hilbert.index(x, y))
    }
  }

  test("locality beats Z-order: max step distance over each curve's walk") {
    // walk the same 4096 consecutive keys on both curves; Hilbert's
    // max Manhattan step is 1 by construction, Morton's seams are big
    def mortonPos(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until 16).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val mortonMax = (1L until (1L << 12)).map { z =>
      val (x1, y1) = mortonPos(z - 1); val (x2, y2) = mortonPos(z)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(mortonMax > 1, "Morton would have no seams?!")
    val hilbertMax = (1L until (1L << 12)).map { d =>
      val (x1, y1) = Hilbert.pos(d - 1); val (x2, y2) = Hilbert.pos(d)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(hilbertMax == 1)
  }
}
