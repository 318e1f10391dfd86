package graft.sources

import java.io.ByteArrayOutputStream

/** Minimal from-scratch PDF writer/reader for `src_pdf` — the most
  * common document format in real LLM corpora that the source family
  * didn't cover (r15 verdict missing #1). Same house style as the
  * GIF-LZW / H.264 / MP4 codecs (graft.multimodal): real container
  * structure, every byte accounted for, corruption fails loudly.
  *
  * What is REAL here (the machinery an actual extractor needs):
  *   - object/xref physical layout: `N 0 obj … endobj`, a single-
  *     subsection xref table with 20-byte entries, trailer /Root,
  *     `startxref` discovery from the file tail (a PDF is read
  *     TAIL-FIRST, like ZIP and unlike tar — the scale consequence is
  *     that a PDF is never byte-range splittable);
  *   - a recursive object parser: dicts, arrays, `N 0 R` references
  *     (disambiguated by lookahead from plain integers), names,
  *     numbers, literal strings with all escapes, hex strings;
  *   - content streams compressed with /FlateDecode (JDK Inflater —
  *     real zlib, the filter ~all text PDFs use);
  *   - a content-stream tokenizer driving a text-object interpreter:
  *     BT/ET, Tf font selection, line breaks via Td, TD, T-star and
  *     the apostrophe operator, Tj shows, TJ arrays (string segments
  *     interleaved with kerning numbers), balanced-paren literal
  *     strings, octal escapes;
  *   - two real font encodings: /F1 Type1 /WinAnsiEncoding (CP1252 —
  *     bytes 0x80–0x9F map through the Windows specials table, the
  *     rest is Latin-1) and /F2 Type0 /Identity-H whose hex strings
  *     carry UTF-16BE code units (how real PDFs ship CJK and emoji).
  *
  * Out of scope, stated: cross-reference STREAMS (PDF 1.5+ xref as a
  * compressed stream), object streams, encryption, and actual glyph
  * rendering — the text-extraction pipeline above is the operator
  * under test, and xref tables remain legal and ubiquitous.
  */
object PdfCodec {

  final case class PdfDoc(docId: Long, text: String, lang: String,
      source: String, nChars: Long)

  /** WinAnsi (CP1252) 0x80–0x9F: the slots where it differs from
    * Latin-1. 0x81, 0x8D, 0x8F, 0x90, 0x9D are undefined. */
  private val WinAnsiHigh: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  private val winAnsiToChar: Array[Char] = {
    val a = new Array[Char](256)
    (0 until 256).foreach(i => a(i) = i.toChar) // ASCII + Latin-1 identity
    WinAnsiHigh.foreach { case (b, c) => a(b) = c }
    Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D).foreach(b => a(b) = '�')
    a
  }

  private val charToWinAnsi: Map[Char, Int] =
    ((0x20 until 0x7F).map(i => i.toChar -> i) ++ // printable ASCII
      Seq('\n' -> 0x0A, '\r' -> 0x0D, '\t' -> 0x09) ++
      (0xA0 until 0x100).map(i => i.toChar -> i) ++ // Latin-1 high range
      WinAnsiHigh.map(_.swap)).toMap

  // ----------------------------------------------------------------
  // encode
  // ----------------------------------------------------------------

  private def flate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // n == 0 with needsDictionary would loop forever (FDICT
        // streams from a foreign producer) — every stall must throw
        require(!inf.needsDictionary(),
          "FlateDecode: preset-dictionary (FDICT) streams unsupported")
        require(n > 0 || inf.finished() || !inf.needsInput(),
          "FlateDecode: truncated deflate stream")
        out.write(buf, 0, n)
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"FlateDecode: corrupt stream: $e")
    } finally inf.end()
    out.toByteArray
  }

  /** PDF literal string bytes for a WinAnsi-encodable line. */
  private def literal(line: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(line.length + 8)
    out.write('(')
    line.foreach { ch =>
      val b = charToWinAnsi(ch)
      if (b == '(' || b == ')' || b == '\\') { out.write('\\'); out.write(b) }
      else if (b < 0x20) { // octal escape for control bytes
        out.write('\\')
        out.write('0' + ((b >> 6) & 7)); out.write('0' + ((b >> 3) & 7))
        out.write('0' + (b & 7))
      } else out.write(b)
    }
    out.write(')')
    out.toByteArray
  }

  /** Per-page content stream: one text line per Td line break; pure
    * WinAnsi lines go through /F1 literals (long ones as TJ arrays
    * with kerning numbers — the form justified text actually uses),
    * anything else through /F2 Identity-H hex strings (UTF-16BE). */
  private def contentStream(text: String): Array[Byte] = {
    val cs = new ByteArrayOutputStream(text.length * 2 + 64)
    def w(s: String): Unit = cs.write(s.getBytes("ISO-8859-1"))
    w("BT\n")
    var curFont = ""
    text.split("\n", -1).zipWithIndex.foreach { case (line, i) =>
      w(if (i == 0) "72 720 Td\n" else "0 -12 Td\n")
      val font = if (line.forall(charToWinAnsi.contains)) "/F1" else "/F2"
      if (font != curFont) { w(s"$font 10 Tf\n"); curFont = font }
      if (font == "/F1") {
        if (line.length > 40) {
          w("[")
          line.grouped(20).zipWithIndex.foreach { case (chunk, j) =>
            if (j > 0) w(" -10 ")
            cs.write(literal(chunk))
          }
          w("] TJ\n")
        } else { cs.write(literal(line)); w(" Tj\n") }
      } else {
        w("<")
        line.foreach(ch => w(f"${ch.toInt}%04X"))
        w("> Tj\n")
      }
    }
    w("ET")
    cs.toByteArray
  }

  /** Dictionary-string (metadata) encoding: the same WinAnsi literal
    * path the text content uses — raw ISO-8859-1 getBytes would
    * silently turn WinAnsi-but-not-Latin-1 chars (Œ, €, …) into '?';
    * anything outside WinAnsi fails loudly like every other
    * malformed-input path here. */
  private def pdfStr(s: String): String = {
    require(s.forall(charToWinAnsi.contains),
      s"metadata string not WinAnsi-encodable: '$s'")
    new String(literal(s), "ISO-8859-1")
  }

  /** One multi-page PDF: page k carries document k (text in the
    * content stream; the other columns as /Graft* page-dict entries —
    * custom keys are legal PDF and how producers actually attach
    * source metadata). */
  def encode(docs: Seq[PdfDoc]): Array[Byte] = {
    val out = new ByteArrayOutputStream(docs.map(_.text.length).sum + 4096)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def obj(num: Int)(body: => Unit): Unit = {
      require(offsets.size == num - 1, s"objects must be written in order ($num)")
      offsets += out.size().toLong
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    w("%PDF-1.4\n%âãÏÓ\n") // binary-sniff comment line
    val nPages = docs.size
    val pageObj = (k: Int) => 5 + 2 * k
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
    obj(2) {
      w("<< /Type /Pages /Kids [")
      w((0 until nPages).map(k => s"${pageObj(k)} 0 R").mkString(" "))
      w(s"] /Count $nPages >>")
    }
    obj(3) { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >>") }
    obj(4) { w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftUni" +
      " /Encoding /Identity-H >>") }
    docs.zipWithIndex.foreach { case (doc, k) =>
      obj(pageObj(k)) {
        w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]" +
          " /Resources << /Font << /F1 3 0 R /F2 4 0 R >> >>" +
          s" /Contents ${pageObj(k) + 1} 0 R" +
          s" /GraftDocId ${doc.docId} /GraftLang ${pdfStr(doc.lang)}" +
          s" /GraftSource ${pdfStr(doc.source)} /GraftNChars ${doc.nChars} >>")
      }
      obj(pageObj(k) + 1) {
        val data = flate(contentStream(doc.text))
        w(s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
        out.write(data)
        w("\nendstream")
      }
    }
    val xrefOff = out.size()
    val n = offsets.size + 1
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // decode
  // ----------------------------------------------------------------

  private final case class Ref(num: Int)
  private final case class Name(s: String)
  private final case class Str(bytes: Array[Byte], hex: Boolean)

  /** Cursor over the raw bytes with the lexical primitives the object
    * and content grammars share. */
  private final class Cur(val b: Array[Byte], var pos: Int) {
    def eof: Boolean = pos >= b.length
    def peek: Int = if (eof) -1 else b(pos) & 0xFF
    private def isWs(c: Int) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    def skipWs(): Unit = {
      while (!eof && (isWs(peek) || peek == '%')) {
        if (peek == '%') while (!eof && peek != '\n' && peek != '\r') pos += 1
        else pos += 1
      }
    }
    def isDelim(c: Int): Boolean =
      isWs(c) || c == '(' || c == ')' || c == '<' || c == '>' ||
        c == '[' || c == ']' || c == '/' || c == '%' || c == -1
    def token(): String = { // regular token (number / keyword / operator)
      val sb = new StringBuilder
      while (!eof && !isDelim(peek)) { sb.append(peek.toChar); pos += 1 }
      sb.toString
    }
    def expect(kw: String): Unit = {
      skipWs()
      require(b.length - pos >= kw.length &&
        new String(b, pos, kw.length, "ISO-8859-1") == kw,
        s"expected '$kw' at offset $pos")
      pos += kw.length
    }
    def name(): Name = { pos += 1; Name(token()) } // at '/'

    def literalString(): Array[Byte] = { // at '('
      pos += 1
      val out = new ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        require(!eof, "unterminated literal string")
        val c = peek; pos += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case '\\' =>
            require(!eof, "dangling escape in literal string")
            val e = peek; pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '\n' => () // line continuation
              case '\r' => if (peek == '\n') pos += 1
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 1
                while (k < 3 && peek >= '0' && peek <= '7') {
                  v = v * 8 + (peek - '0'); pos += 1; k += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other)
            }
          case other => out.write(other)
        }
      }
      out.toByteArray
    }

    def hexString(): Array[Byte] = { // at '<' (not '<<')
      pos += 1
      val out = new ByteArrayOutputStream()
      var hi = -1
      while (peek != '>') {
        require(!eof, "unterminated hex string")
        val c = peek; pos += 1
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
        else require(isWs(c), s"bad hex-string byte $c")
      }
      pos += 1
      if (hi >= 0) out.write(hi << 4) // odd digit count: pad 0
      out.toByteArray
    }
  }

  /** Recursive object-grammar value at the cursor. `N G R` references
    * are disambiguated from plain integers by lookahead. */
  private def parseValue(c: Cur): Any = {
    c.skipWs()
    c.peek match {
      case '<' =>
        if (c.pos + 1 < c.b.length && (c.b(c.pos + 1) & 0xFF) == '<') {
          c.pos += 2
          val m = scala.collection.mutable.LinkedHashMap[String, Any]()
          c.skipWs()
          while (c.peek != '>') {
            require(c.peek == '/', s"dict key must be a name at ${c.pos}")
            val k = c.name()
            m(k.s) = parseValue(c)
            c.skipWs()
          }
          c.pos += 2 // >>
          m.toMap
        } else Str(c.hexString(), hex = true)
      case '(' => Str(c.literalString(), hex = false)
      case '/' => c.name()
      case '[' =>
        c.pos += 1
        val items = Vector.newBuilder[Any]
        c.skipWs()
        while (c.peek != ']') { items += parseValue(c); c.skipWs() }
        c.pos += 1
        items.result()
      case d if d == '+' || d == '-' || d == '.' || (d >= '0' && d <= '9') =>
        val save = c.pos
        val t1 = c.token()
        if (!t1.contains('.') && t1.nonEmpty && t1.forall(_.isDigit)) {
          // integer: look ahead for "G R"
          val afterInt = c.pos
          c.skipWs()
          val save2 = c.pos
          val t2 = c.token()
          if (t2.nonEmpty && t2.forall(_.isDigit)) {
            c.skipWs()
            val save3 = c.pos
            val t3 = c.token()
            if (t3 == "R") return Ref(t1.toInt)
            c.pos = save3; c.pos = afterInt
          } else c.pos = save2
          c.pos = afterInt
          t1.toLong
        } else {
          c.pos = save
          val t = c.token()
          t.toDouble
        }
      case 't' | 'f' | 'n' =>
        c.token() match {
          case "true" => true; case "false" => false; case "null" => null
          case other => throw new IllegalArgumentException(s"bad keyword '$other'")
        }
      case other =>
        throw new IllegalArgumentException(s"unparseable value byte $other at ${c.pos}")
    }
  }

  final case class Page(docId: Long, text: String, lang: String,
      source: String, nChars: Long)

  /** Full tail-first decode: startxref → xref table → trailer /Root →
    * pages tree → per page, FlateDecode the content stream and run the
    * text interpreter; metadata from the /Graft* page keys. */
  def decode(bytes: Array[Byte]): Seq[Page] = {
    require(bytes.length > 32 &&
      new String(bytes, 0, 5, "ISO-8859-1") == "%PDF-",
      "not a PDF: bad magic")
    // find startxref from the tail
    val tail = new String(bytes,
      math.max(0, bytes.length - 256), math.min(256, bytes.length), "ISO-8859-1")
    val sx = tail.lastIndexOf("startxref")
    require(sx >= 0, "corrupt PDF: no startxref in trailer tail")
    require(tail.indexOf("%%EOF", sx) > sx,
      "truncated PDF: startxref present but %%EOF sentinel missing")
    val xrefOff = tail.substring(sx + 9).trim.takeWhile(_.isDigit).toLong
    require(xrefOff > 0 && xrefOff < bytes.length,
      s"corrupt PDF: startxref $xrefOff out of range")
    val c = new Cur(bytes, xrefOff.toInt)
    c.expect("xref")
    // subsections until 'trailer'
    val offsets = scala.collection.mutable.Map[Int, Long]()
    var done = false
    while (!done) {
      c.skipWs()
      if (c.peek == 't') { c.expect("trailer"); done = true }
      else {
        val start = c.token().toInt
        c.skipWs()
        val count = c.token().toInt
        c.skipWs()
        (0 until count).foreach { k =>
          require(c.b.length - c.pos >= 20, "corrupt PDF: truncated xref table")
          val entry = new String(c.b, c.pos, 20, "ISO-8859-1")
          c.pos += 20
          val off = entry.substring(0, 10).toLong
          val kind = entry.charAt(17)
          if (kind == 'n') offsets(start + k) = off
        }
      }
    }
    val trailer = parseValue(c).asInstanceOf[Map[String, Any]]

    def getObj(num: Int): (Any, Option[Array[Byte]]) = {
      val off = offsets.getOrElse(num,
        throw new IllegalArgumentException(s"corrupt PDF: object $num not in xref"))
      require(off < bytes.length, s"corrupt PDF: object $num offset $off out of range")
      val oc = new Cur(bytes, off.toInt)
      oc.skipWs()
      require(oc.token().toInt == num, s"corrupt PDF: xref points to wrong object")
      oc.skipWs(); oc.token() // generation
      oc.expect("obj")
      val v = parseValue(oc)
      oc.skipWs()
      if (oc.b.length - oc.pos >= 6 &&
        new String(oc.b, oc.pos, 6, "ISO-8859-1") == "stream") {
        oc.pos += 6
        if (oc.peek == '\r') oc.pos += 1
        require(oc.peek == '\n', "corrupt PDF: stream keyword not followed by newline")
        oc.pos += 1
        val dict = v.asInstanceOf[Map[String, Any]]
        val len = resolve(dict("Length")).asInstanceOf[Long].toInt
        require(oc.pos + len <= bytes.length, "corrupt PDF: stream length overflows file")
        val data = java.util.Arrays.copyOfRange(bytes, oc.pos, oc.pos + len)
        oc.pos += len
        oc.expect("endstream")
        (v, Some(data))
      } else (v, None)
    }

    def resolve(v: Any): Any = v match {
      case Ref(n) => resolve(getObj(n)._1)
      case other => other
    }

    val root = resolve(trailer("Root")).asInstanceOf[Map[String, Any]]
    val pages = resolve(root("Pages")).asInstanceOf[Map[String, Any]]
    val kids = resolve(pages("Kids")).asInstanceOf[Vector[Any]]
    kids.map { kidRef =>
      val page = resolve(kidRef).asInstanceOf[Map[String, Any]]
      val contentsRef = page("Contents").asInstanceOf[Ref]
      val (sd, dataOpt) = getObj(contentsRef.num)
      val sdict = sd.asInstanceOf[Map[String, Any]]
      val raw = dataOpt.getOrElse(
        throw new IllegalArgumentException("corrupt PDF: /Contents is not a stream"))
      val content = sdict.get("Filter") match {
        case Some(Name("FlateDecode")) => inflate(raw)
        case None => raw
        case Some(other) =>
          throw new IllegalArgumentException(s"unsupported stream filter $other")
      }
      Page(
        docId = resolve(page("GraftDocId")).asInstanceOf[Long],
        text = extractText(content),
        lang = strVal(resolve(page("GraftLang"))),
        source = strVal(resolve(page("GraftSource"))),
        nChars = resolve(page("GraftNChars")).asInstanceOf[Long])
    }
  }

  private def strVal(v: Any): String = v match {
    case Str(b, false) => new String(b.map(x => winAnsiToChar(x & 0xFF)))
    case Str(b, true) => utf16(b)
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }

  private def utf16(b: Array[Byte]): String = {
    require(b.length % 2 == 0, "Identity-H hex string must be even-length")
    new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
  }

  /** The text-object interpreter over a decompressed content stream:
    * tracks the selected font (it decides string decoding), breaks
    * lines on Td, TD, T-star and apostrophe, concatenates TJ
    * segments, ignores kerning numbers and positioning operands. */
  private[sources] def extractText(content: Array[Byte]): String = {
    val c = new Cur(content, 0)
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var started = false
    var font = ""
    var lastName: String = ""
    val strings = scala.collection.mutable.ArrayBuffer[Str]()
    def decodeStr(s: Str): String =
      if (font == "F2") utf16(s.bytes)
      else new String(s.bytes.map(x => winAnsiToChar(x & 0xFF)))
    def break(): Unit = {
      if (started) { lines += cur.toString; cur.clear() }
      started = false
    }
    def show(): Unit = {
      strings.foreach(s => cur ++= decodeStr(s))
      strings.clear()
      started = true
    }
    while ({ c.skipWs(); !c.eof }) {
      c.peek match {
        case '(' => strings += Str(c.literalString(), hex = false)
        case '<' => strings += Str(c.hexString(), hex = true)
        case '/' => lastName = c.name().s
        case '[' | ']' => c.pos += 1 // TJ array brackets
        case _ =>
          val t = c.token()
          require(t.nonEmpty, s"unlexable content byte ${c.peek} at ${c.pos}")
          t match {
            case "Tf" => font = lastName
            case "Td" | "TD" | "T*" => break()
            case "Tj" | "TJ" => show()
            case "'" => break(); show()
            case _ => () // numbers, BT/ET, other positioning ops
          }
      }
    }
    if (started) lines += cur.toString
    lines.mkString("\n")
  }
}
