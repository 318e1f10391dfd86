package graft.mr

/** Native Scala ports of the reference's shipped executables
  * (SURVEY.md §2.2) — each function is a per-partition line-stream
  * transform suitable for [[FnSpec]]. Semantics matched shell-op by
  * shell-op, including the empty-token behavior the goldens depend on
  * (SURVEY.md §2.4.3).
  */
object Workloads {

  /** wc_map.sh (tests/testdata/exec/wc_map.sh:12):
    * `tr '[ \t]' '\n' | tr '[:upper:]' '[:lower:]' | awk '{print $1"\t1"}'`
    * — every space/tab starts a new token, so consecutive separators
    * emit EMPTY tokens ("\t1" lines), which the golden counts
    * (word_count_correct.txt:1 is "\t9"). */
  def wcMapSh(lines: Iterator[String]): Iterator[String] =
    lines.flatMap(_.split("[ \t]", -1).map(tok => s"${tok.toLowerCase}\t1"))

  /** wc_reduce.sh (tests/testdata/exec/wc_reduce.sh:14):
    * `cut -f1 | uniq -c | awk '{print $2"\t"$1}'` — adjacent-key
    * count over the sorted stream. */
  def wcReduceSh(lines: Iterator[String]): Iterator[String] =
    MapReduceJob.groupAdjacent(lines).map { case (k, vs) => s"$k\t${vs.size}" }

  /** wc_map.py (tests/testdata/exec/wc_map.py:6-9): Python
    * `str.split()` — runs of whitespace, NO empty tokens, no
    * lowercasing. */
  def wcMapPy(lines: Iterator[String]): Iterator[String] =
    lines.flatMap(_.split("\\s+").filter(_.nonEmpty).map(w => s"$w\t1"))

  /** wc_reduce.py (tests/testdata/exec/wc_reduce.py:11-30): group
    * adjacent keys, sum int values, emit `key SPACE total`. */
  def wcReducePy(lines: Iterator[String]): Iterator[String] =
    MapReduceJob.groupAdjacent(lines).map { case (k, vs) =>
      val total = vs.map(l => l.substring(l.indexOf('\t') + 1).toInt).sum
      s"$k $total"
    }

  /** grep_map.py (tests/testdata/exec/grep_map.py:14-28): strip, drop
    * blanks, keep lines whose lowercase contains the query, emit
    * `1 TAB line`. */
  def grepMap(query: String = "product")(lines: Iterator[String]): Iterator[String] =
    lines.map(_.strip()).filter(_.nonEmpty)
      .filter(_.toLowerCase.contains(query))
      .map(l => s"1\t$l")

  /** grep_reduce.py (tests/testdata/exec/grep_reduce.py:14-27):
    * project the value; lines that don't split into exactly 2 TAB
    * fields are dropped. */
  def grepReduce(lines: Iterator[String]): Iterator[String] =
    lines.map(_.strip()).map(_.split("\t")).collect {
      case Array(_, value) => value
    }
}
