package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Porter stemmer pinning: every step of the generated SQL cascade is
  * run IN ISOLATION against the example table the 1980 paper gives for
  * that step (the per-step tables are the paper's own ground truth —
  * they are step-local, not full-pipeline outputs), plus full-pipeline
  * classics and structural invariants. The same generator emits the
  * DuckDB oracle, so oracle parity is covered by the t2 gate. */
class PorterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Run the cascade (one step, or all) over a word list. */
  private def stem(words: Seq[String], only: Option[String]): Map[String, String] = {
    import spark.implicits._
    words.toDF("tok").createOrReplaceTempView("porter_words")
    val (ctes, out) = PorterSql.chain(PorterSql.SparkDia, only)
    spark.sql(
      s"""WITH voc AS (SELECT tok, CAST(1 AS BIGINT) AS n FROM porter_words),
         |$ctes
         |SELECT tok, w FROM $out""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  private def pinStep(step: String, cases: (String, String)*): Unit = {
    val got = stem(cases.map(_._1), Some(step))
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"$step($in): got ${got(in)}, want $want")
    }
  }

  test("step 1a: plural stripping (paper examples)") {
    pinStep("s1a",
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat")
  }

  test("step 1b: eed/ed/ing + cleanup (paper examples)") {
    pinStep("s1b",
      "feed" -> "feed", "agreed" -> "agree", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      // cleanup: at/bl/iz restore an e
      "conflated" -> "conflate", "troubled" -> "trouble", "sized" -> "size",
      // cleanup: doubled consonant (not l/s/z) single-letters
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz",
      // cleanup: short *o stem gets an e
      "failing" -> "fail", "filing" -> "file")
  }

  test("step 1c: y → i when the stem has a vowel (paper examples)") {
    pinStep("s1c", "happy" -> "happi", "sky" -> "sky")
  }

  test("step 2: double-suffix mapping under m>0 (paper examples)") {
    pinStep("s2",
      "relational" -> "relate", "conditional" -> "condition",
      "rational" -> "rational", // m(r)=0: the longest match gates, no fallthrough
      "valenci" -> "valence", "hesitanci" -> "hesitance",
      "digitizer" -> "digitize", "conformabli" -> "conformable",
      "radicalli" -> "radical", "differentli" -> "different",
      "vileli" -> "vile", "analogousli" -> "analogous",
      "vietnamization" -> "vietnamize", "predication" -> "predicate",
      "operator" -> "operate", "feudalism" -> "feudal",
      "decisiveness" -> "decisive", "hopefulness" -> "hopeful",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensitive", "sensibiliti" -> "sensible")
  }

  test("step 3: -icate/-ative/-alize/-iciti/-ical/-ful/-ness (paper examples)") {
    pinStep("s3",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electric",
      "electrical" -> "electric", "hopeful" -> "hope", "goodness" -> "good")
  }

  test("step 4: single-suffix deletion under m>1 (paper examples)") {
    pinStep("s4",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", // ION needs the stem to end s/t
      "homologou" -> "homolog", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect",
      "bowdlerize" -> "bowdler")
  }

  test("step 5a: final-e removal (paper examples)") {
    pinStep("s5a", "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas")
  }

  test("step 5b: -ll under m>1 (paper examples)") {
    pinStep("s5b", "controll" -> "control", "roll" -> "roll")
  }

  test("full pipeline: inflection families collapse to one stem") {
    val got = stem(Seq(
      "connect", "connected", "connecting", "connection", "connections",
      "argument", "arguments", "controlling", "controlled",
      "caresses", "ponies", "cats", "happy", "sky",
      "hopping", "filing", "relational"), None)
    Seq("connect", "connected", "connecting", "connection", "connections")
      .foreach(w => assert(got(w) == "connect", s"$w -> ${got(w)}"))
    // the famous asymmetry: argument keeps its -ment (m(argu)=1, not >1)
    assert(got("argument") == "argument" && got("arguments") == "argument")
    assert(got("controlling") == "control" && got("controlled") == "control")
    assert(got("caresses") == "caress" && got("ponies") == "poni"
      && got("cats") == "cat")
    assert(got("happy") == "happi" && got("sky") == "sky")
    assert(got("hopping") == "hop" && got("filing") == "file")
    // per-step tables are step-local: the FULL pipeline takes
    // relational through step 2 (-> relate) AND step 5a (-> relat)
    assert(got("relational") == "relat")
  }

  test("invariants: stems are lowercase alpha and never longer than the word") {
    val words = Seq("caresses", "agreed", "conflated", "hopping", "happy",
      "relational", "vietnamization", "hopefulness", "electriciti",
      "adoption", "bowdlerize", "probate", "controll", "oscillate",
      "generalization", "representative", "university", "universities")
    val got = stem(words, None)
    words.foreach { w =>
      val s = got(w)
      assert(s.nonEmpty && s.matches("[a-z]+"), s"$w -> '$s'")
      assert(s.length <= w.length,
        s"$w -> $s grew: every rule's replacement is no longer than its suffix")
    }
  }

  test("guard: short and non-alpha tokens pass through the full query unstemmed") {
    import spark.implicits._
    Seq("go", "ab", "x9y", "the", "running", "run's").toDF("tok")
      .createOrReplaceTempView("porter_words")
    val (ctes, out) = PorterSql.chain(PorterSql.SparkDia)
    val got = spark.sql(
      s"""WITH voc AS (SELECT tok, CAST(1 AS BIGINT) AS n FROM porter_words),
         |$ctes
         |SELECT tok, w FROM $out""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the stemmable CTE filters these out entirely (passthru handles
    // them in the full query); only qualifying words reach the cascade
    assert(!got.contains("go") && !got.contains("ab") && !got.contains("x9y")
      && !got.contains("run's"))
    assert(got("running") == "run" && got("the") == "the")
  }
}
