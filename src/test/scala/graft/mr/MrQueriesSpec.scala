package graft.mr

import org.scalatest.funsuite.AnyFunSuite

/** The mr_grep staging mapper's oracle-parity contract (r10 advice):
  * edge trimming mirrors DuckDB trim() exactly (spaces only), and the
  * two data-dependent divergence classes — embedded tabs (reducer
  * 2-field drop) and CR (line-reader eats it) — fail LOUDLY instead
  * of silently passing or failing on corpus luck. */
class MrQueriesSpec extends AnyFunSuite {

  private def run(lines: String*): Seq[String] =
    MrQueries.grepStageMapper(lines.iterator).toSeq

  test("spaceTrim is DuckDB trim(): spaces only, all other whitespace kept") {
    assert(MrQueries.spaceTrim("  a spark b  ") == "a spark b")
    assert(MrQueries.spaceTrim("") == "")
    assert(MrQueries.spaceTrim("   ") == "")
    // NBSP / form-feed edges survive — Java .strip() would eat them,
    // the oracle's trim() does not; both engines must agree
    assert(MrQueries.spaceTrim(" spark ") == " spark ")
    assert(MrQueries.spaceTrim(" \fspark ") == "\fspark")
  }

  test("mapper keeps matching lines space-trimmed, drops blanks and non-matches") {
    assert(run("  uses Spark here ", "no match", "   ", "SPARK!") ===
      Seq("1\tuses Spark here", "1\tSPARK!"))
  }

  test("edge-NBSP lines flow through with the NBSP intact (strip/trim parity)") {
    assert(run(" spark ") === Seq("1\t spark "))
  }

  test("a staged line containing a tab fails the job loudly, never a silent drop") {
    val e = intercept[IllegalArgumentException](run("spark\tsplit").toList)
    assert(e.getMessage.contains("no tab/CR"))
  }

  test("a staged line containing CR fails the job loudly") {
    val e = intercept[IllegalArgumentException](run("spark line\r").toList)
    assert(e.getMessage.contains("no tab/CR"))
  }
}

/** spaceTrim must be EXACTLY DuckDB trim() for every string. */
object SpaceTrimProps extends org.scalacheck.Properties("spaceTrim") {
  import org.scalacheck.{Gen, Prop}

  private val gen: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.const(' '), 3 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', '\f', ' ', '　'))).map(_.mkString)

  property("equals reference space-only trim; idempotent; keeps other whitespace") =
    Prop.forAll(gen) { s =>
      val ref = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val got = MrQueries.spaceTrim(s)
      got == ref && MrQueries.spaceTrim(got) == got
    }
}
