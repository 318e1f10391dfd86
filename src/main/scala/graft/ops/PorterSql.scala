package graft.ops

/** The Porter stemmer (M.F. Porter 1980, "An algorithm for suffix
  * stripping", Program 14(3)) expressed as a PURE SQL rewrite cascade,
  * GENERATED from one shared rule table into both engines' dialects —
  * the `text_nfkc` pinned-table replay technique scaled up from a
  * replacement table to a conditional rewrite system (r15 verdict
  * item 7). No UDF, no custom expression: both engines replay the
  * identical rule order, so the DuckDB oracle independently computes
  * the same stems the Spark plan does.
  *
  * The measure trick that makes Porter SQL-expressible: a word's
  * consonant/vowel form is computed by three global regex replaces
  * (vowels → v; y after a non-vowel → v, matching Porter's
  * "Y preceded by a consonant is a vowel"; everything else → c), and
  * the measure m — the number of VC blocks in [C](VC)^m[V] — is then
  * `length(cv) - length(replace(cv, 'vc', 'v'))`: VC boundaries are
  * disjoint, so each non-overlapping 'vc' replacement removes exactly
  * one character. All of Porter's conditions reduce to this cv form
  * plus plain string ops:
  *   *v*  = cv contains 'v';
  *   *o   = cv ends 'cvc' and the last letter is not w/x/y;
  *   *d   = last two letters equal and not a vowel (deliberate
  *          deviation: a doubled 'yy' ending never counts — Porter's
  *          recursive cons() would accept "...xyy"; no English word
  *          the algorithm targets ends in a doubled y).
  *
  * Rule selection within a step is longest-suffix-first with AT MOST
  * ONE rule firing — if the longest matching suffix's condition
  * fails, the step does nothing (Porter's semantics: the condition
  * gates the REWRITE, not the match). Step 2 keeps the original
  * paper's ABLI → ABLE (the later revision's BLI → BLE is a
  * different, post-1980 algorithm). Words shorter than 3 letters or
  * containing anything outside [a-z] pass through unstemmed (porter.c
  * returns immediately for k ≤ k0+1).
  *
  * Scale stance: stemming is applied to the DISTINCT VOCABULARY, not
  * the token stream — the cascade is vocabulary-sized work after one
  * corpus tokenize pass, and the result joins back by aggregation
  * (group-by stem over (token, count) rows). At 100 TB the vocabulary
  * grows with Heaps' law (~|corpus|^0.5), so the rewrite cost is
  * sublinear in the corpus.
  */
private[ops] object PorterSql {

  /** The two dialect knobs the generated SQL needs: global regex
    * replace (Spark's 3-arg regexp_replace is global; DuckDB needs the
    * 'g' flag), replacement-string group references ($1 vs \1), and
    * the regex-match predicate (RLIKE vs regexp_matches). */
  final case class Dialect(sparkSql: Boolean) {
    def gsub(e: String, pat: String, rep: String): String =
      if (sparkSql) s"regexp_replace($e, '$pat', '$rep')"
      else s"regexp_replace($e, '$pat', '$rep', 'g')"
    def ref1: String = if (sparkSql) "$1" else "\\1"
    def matches(e: String, pat: String): String =
      if (sparkSql) s"$e RLIKE '$pat'" else s"regexp_matches($e, '$pat')"
  }
  val SparkDia: Dialect = Dialect(sparkSql = true)
  val DuckDia: Dialect = Dialect(sparkSql = false)

  /** The cv (consonant/vowel) form of an expression. Markers are
    * UPPERCASE V/C — they must be outside [a-z], or words containing
    * the letters v/c would corrupt the form (first caught on "reviv":
    * with lowercase markers it collapsed to "rvvvv", measure 0). */
  private def cv(e: String, dia: Dialect): String =
    dia.gsub(dia.gsub(dia.gsub(e, "[aeiou]", "V"),
      "([^V])y", dia.ref1 + "V"), "[^V]", "C")

  /** Porter's measure m, off an already-computed cv-form column. */
  private def m(cvCol: String): String =
    s"(length($cvCol) - length(replace($cvCol, 'VC', 'V')))"

  private def lastCh(e: String): String = s"substr($e, length($e), 1)"

  /** *d: ends in a doubled consonant (see the yy deviation note). */
  private def dd(e: String): String =
    s"(length($e) >= 2 AND substr($e, length($e) - 1, 1) = ${lastCh(e)}" +
      s" AND ${lastCh(e)} NOT IN ('a','e','i','o','u','y'))"

  /** *o on (stem expression, its cv column). */
  private def cvcO(stem: String, cvCol: String): String =
    s"($cvCol LIKE '%CVC' AND ${lastCh(stem)} NOT IN ('w','x','y'))"

  /** (suffix, replacement, condition id): 0 = unconditional, 1 = m>0,
    * 2 = m>1, 3 = m>1 AND the stem ends in s or t (step 4's ION). */
  private val Step1a: Seq[(String, String, Int)] =
    Seq(("sses", "ss", 0), ("ies", "i", 0), ("ss", "ss", 0), ("s", "", 0))

  private val Step2: Seq[(String, String, Int)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    .map { case (s, r) => (s, r, 1) }

  private val Step3: Seq[(String, String, Int)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")
    .map { case (s, r) => (s, r, 1) }

  private val Step4: Seq[(String, String, Int)] =
    (Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent").map(s => (s, "", 2)) :+ (("ion", "", 3))) ++
      Seq("ou", "ism", "ate", "iti", "ous", "ive", "ize").map(s => (s, "", 2))

  /** A standard table-driven step as four chained CTEs ending in a CTE
    * named `name` with columns (tok, n, w). Longest-suffix-first CASE
    * selects at most one rule; its condition gates the rewrite. */
  private def ruleStep(name: String, prev: String,
      rules: Seq[(String, String, Int)], dia: Dialect): String = {
    val ordered = rules.sortBy { case (s, _, _) => -s.length } // stable
    def cases(f: ((String, String, Int)) => String, els: String) =
      ordered.map(r => s"WHEN w LIKE '%${r._1}' THEN ${f(r)}")
        .mkString("CASE ", " ", s" ELSE $els END")
    s"""${name}_a AS (
       |  SELECT tok, n, w,
       |    ${cases(r => s"'${r._1}'", "''")} AS sfx,
       |    ${cases(r => s"'${r._2}'", "''")} AS rep,
       |    ${cases(r => r._3.toString, "0")} AS cid
       |  FROM $prev),
       |${name}_b AS (
       |  SELECT tok, n, w, sfx, rep, cid,
       |    CASE WHEN sfx = '' THEN w
       |         ELSE substr(w, 1, length(w) - length(sfx)) END AS stem
       |  FROM ${name}_a),
       |${name}_c AS (
       |  SELECT tok, n, w, sfx, rep, cid, stem, ${cv("stem", dia)} AS cvf
       |  FROM ${name}_b),
       |$name AS (
       |  SELECT tok, n,
       |    CASE WHEN sfx <> '' AND (cid = 0
       |        OR (cid = 1 AND ${m("cvf")} > 0)
       |        OR (cid = 2 AND ${m("cvf")} > 1)
       |        OR (cid = 3 AND ${m("cvf")} > 1
       |            AND ${lastCh("stem")} IN ('s','t')))
       |      THEN stem || rep ELSE w END AS w
       |  FROM ${name}_c)""".stripMargin
  }

  /** Step 1b: EED/ED/ING plus the fired-rule cleanup (AT/BL/IZ get an
    * e back; a doubled consonant other than l/s/z single-letters; a
    * short *o stem gets an e). */
  private def step1b(prev: String, dia: Dialect): String =
    s"""s1b_a AS (
       |  SELECT tok, n, w,
       |    CASE WHEN w LIKE '%eed' THEN 'eed'
       |         WHEN w LIKE '%ed' THEN 'ed'
       |         WHEN w LIKE '%ing' THEN 'ing' ELSE '' END AS sfx
       |  FROM $prev),
       |s1b_b AS (
       |  SELECT tok, n, w, sfx,
       |    CASE WHEN sfx = '' THEN w
       |         ELSE substr(w, 1, length(w) - length(sfx)) END AS stem
       |  FROM s1b_a),
       |s1b_c AS (
       |  SELECT tok, n, w, sfx, stem, ${cv("stem", dia)} AS cvf FROM s1b_b),
       |s1b_d AS (
       |  SELECT tok, n,
       |    CASE WHEN sfx = 'eed' AND ${m("cvf")} > 0 THEN stem || 'ee'
       |         WHEN sfx IN ('ed','ing') AND cvf LIKE '%V%' THEN stem
       |         ELSE w END AS w,
       |    CASE WHEN sfx IN ('ed','ing') AND cvf LIKE '%V%' THEN 1
       |         ELSE 0 END AS fired
       |  FROM s1b_c),
       |s1b_e AS (SELECT tok, n, w, fired, ${cv("w", dia)} AS cvw FROM s1b_d),
       |s1b AS (
       |  SELECT tok, n,
       |    CASE WHEN fired = 0 THEN w
       |         WHEN w LIKE '%at' OR w LIKE '%bl' OR w LIKE '%iz' THEN w || 'e'
       |         WHEN ${dd("w")} AND ${lastCh("w")} NOT IN ('l','s','z')
       |           THEN substr(w, 1, length(w) - 1)
       |         WHEN ${m("cvw")} = 1 AND ${cvcO("w", "cvw")} THEN w || 'e'
       |         ELSE w END AS w
       |  FROM s1b_e)""".stripMargin

  /** Step 1c: (*v*) Y → I. */
  private def step1c(prev: String, dia: Dialect): String =
    s"""s1c_a AS (
       |  SELECT tok, n, w,
       |    CASE WHEN w LIKE '%y' THEN substr(w, 1, length(w) - 1)
       |         ELSE '' END AS stem
       |  FROM $prev),
       |s1c_b AS (SELECT tok, n, w, stem, ${cv("stem", dia)} AS cvf FROM s1c_a),
       |s1c AS (
       |  SELECT tok, n,
       |    CASE WHEN stem <> '' AND cvf LIKE '%V%' THEN stem || 'i'
       |         ELSE w END AS w
       |  FROM s1c_b)""".stripMargin

  /** Step 5a: (m>1) E → ∅; (m=1 and not *o) E → ∅. */
  private def step5a(prev: String, dia: Dialect): String =
    s"""s5a_a AS (
       |  SELECT tok, n, w,
       |    CASE WHEN w LIKE '%e' THEN substr(w, 1, length(w) - 1)
       |         ELSE '' END AS stem
       |  FROM $prev),
       |s5a_b AS (SELECT tok, n, w, stem, ${cv("stem", dia)} AS cvf FROM s5a_a),
       |s5a AS (
       |  SELECT tok, n,
       |    CASE WHEN stem <> '' AND (${m("cvf")} > 1
       |        OR (${m("cvf")} = 1 AND NOT ${cvcO("stem", "cvf")}))
       |      THEN stem ELSE w END AS w
       |  FROM s5a_b)""".stripMargin

  /** Step 5b: (m>1 and *d and *L) → single letter. */
  private def step5b(prev: String, dia: Dialect): String =
    s"""s5b_a AS (SELECT tok, n, w, ${cv("w", dia)} AS cvw FROM $prev),
       |s5b AS (
       |  SELECT tok, n,
       |    CASE WHEN ${m("cvw")} > 1 AND ${dd("w")} AND ${lastCh("w")} = 'l'
       |      THEN substr(w, 1, length(w) - 1) ELSE w END AS w
       |  FROM s5b_a)""".stripMargin

  private[ops] val StepNames =
    Seq("s1a", "s1b", "s1c", "s2", "s3", "s4", "s5a", "s5b")

  private def build(name: String, prev: String, dia: Dialect): String =
    name match {
      case "s1a" => ruleStep("s1a", prev, Step1a, dia)
      case "s1b" => step1b(prev, dia)
      case "s1c" => step1c(prev, dia)
      case "s2"  => ruleStep("s2", prev, Step2, dia)
      case "s3"  => ruleStep("s3", prev, Step3, dia)
      case "s4"  => ruleStep("s4", prev, Step4, dia)
      case "s5a" => step5a(prev, dia)
      case "s5b" => step5b(prev, dia)
    }

  private def guard(dia: Dialect): String =
    s"${dia.matches("tok", "^[a-z]+$")} AND length(tok) > 2"

  /** CTE chain from a `voc(tok, n)` CTE through the selected steps
    * (default: all eight, i.e. the full algorithm); returns (CTE text,
    * name of the final CTE, whose `w` column is the stem). `only` runs
    * a single step in isolation — how PorterSpec pins each step
    * against the 1980 paper's own example tables. */
  private[ops] def chain(dia: Dialect, only: Option[String] = None)
      : (String, String) = {
    val selected = only.map(Seq(_)).getOrElse(StepNames)
    val parts = Seq.newBuilder[String]
    parts += s"""stemmable AS (
                |  SELECT tok, n, tok AS w FROM voc WHERE ${guard(dia)})""".stripMargin
    var prev = "stemmable"
    selected.foreach { name => parts += build(name, prev, dia); prev = name }
    (parts.result().mkString(",\n"), prev)
  }

  /** The full declared-query SQL: tokenize → vocabulary with counts →
    * cascade over the stemmable vocabulary (everything else passes
    * through as its own stem) → per-stem aggregation of the forms it
    * unifies, keeping only stems that actually merged ≥ 2 surface
    * forms — top 100 by token mass, stem-asc tie-break. */
  private[ops] def fullSql(dia: Dialect, tokSource: String): String = {
    val (ctes, out) = chain(dia)
    s"""WITH tokc AS ($tokSource),
       |voc AS (SELECT tok, COUNT(*) AS n FROM tokc GROUP BY tok),
       |passthru AS (
       |  SELECT tok, n, tok AS stem FROM voc WHERE NOT (${guard(dia)})),
       |$ctes,
       |stemmed AS (
       |  SELECT tok, n, w AS stem FROM $out
       |  UNION ALL SELECT tok, n, stem FROM passthru)
       |SELECT stem, CAST(SUM(n) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_forms,
       |  MIN(tok) AS form_min, MAX(tok) AS form_max
       |FROM stemmed GROUP BY stem HAVING COUNT(*) >= 2
       |ORDER BY n_tokens DESC, stem LIMIT 100""".stripMargin
  }
}
