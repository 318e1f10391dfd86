package graft.multimodal

/** One parsed SubRip cue. */
final case class SrtCue(index: Int, startMs: Long, endMs: Long, text: String)

/** Pure-JVM SubRip (.srt) codec — the timed-text sidecar of every
  * video corpus: caption cues with millisecond time ranges, the
  * transcript source for audio/video training data. Encodes the
  * canonical blank-line-separated block form; decodes with strict
  * validation (monotone indices, `HH:MM:SS,mmm` stamps, start < end,
  * non-overlapping ordered cues) so a malformed subtitle file raises
  * IllegalArgumentException rather than silently contributing
  * garbage timings at 100 TB. */
object SrtCodec {

  private def fmt(ms: Long): String = {
    require(ms >= 0, s"negative timestamp $ms")
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"
  }

  /** Canonical SRT text for the given cues (1-based running index). */
  def encode(cues: Seq[(Long, Long, String)]): String =
    cues.zipWithIndex.map { case ((s, e, text), i) =>
      require(s < e, s"cue $i empty/negative range $s..$e")
      require(!text.contains("\n\n"), "blank line inside cue text")
      s"${i + 1}\n${fmt(s)} --> ${fmt(e)}\n$text"
    }.mkString("", "\n\n", "\n")

  private val Stamp = """(\d{2,}):(\d{2}):(\d{2}),(\d{3})""".r
  private val Range = """(.+?) --> (.+)""".r

  private def parseStamp(s: String): Long = s.trim match {
    case Stamp(h, m, sec, ms) =>
      val mm = m.toLong; val ss = sec.toLong
      require(mm < 60 && ss < 60, s"out-of-range minutes/seconds in '$s'")
      h.toLong * 3600000 + mm * 60000 + ss * 1000 + ms.toLong
    case other => throw new IllegalArgumentException(s"bad timestamp '$other'")
  }

  /** Parse a full SRT document; fails loudly on structural damage. */
  def decode(srt: String): Seq[SrtCue] = {
    val blocks = srt.split("\n\\s*\n").map(_.trim).filter(_.nonEmpty)
    val cues = blocks.zipWithIndex.map { case (b, i) =>
      val lines = b.split("\n")
      require(lines.length >= 2, s"block $i has no timing line")
      val idx = lines(0).trim.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"block $i: bad index '${lines(0)}'"))
      require(idx == i + 1, s"block $i: index $idx not sequential")
      val (s, e) = lines(1) match {
        case Range(a, bEnd) => (parseStamp(a), parseStamp(bEnd))
        case other => throw new IllegalArgumentException(s"block $i: bad range '$other'")
      }
      require(s < e, s"block $i: start $s not before end $e")
      SrtCue(idx, s, e, lines.drop(2).mkString("\n"))
    }.toSeq
    cues.sliding(2).foreach {
      case Seq(a, b) => require(a.endMs <= b.startMs,
        s"cues ${a.index}/${b.index} overlap (${a.endMs} > ${b.startMs})")
      case _ => ()
    }
    cues
  }
}
