package graft.multimodal

/** H.264/AVC Annex-B container codec — NAL-unit level, completing
  * the [[Mp3Codec]]/[[AviCodec]] container-walk family for the
  * compressed video modality: encode synthesizes REAL Annex-B byte
  * streams (both 4-byte and 3-byte start codes, proper NAL header
  * bytes for SPS/PPS/IDR/non-IDR units), and decode scans the raw
  * bytes for start codes, classifies every NAL by its header's
  * forbidden/ref_idc/type fields, and sums slice payload bytes.
  * The slice payload's CABAC/transform decode genuinely needs a
  * media library and stays out of scope; every Annex-B container
  * structure is parsed for real, so [[MultimodalOps.mmH264]] can
  * hash-gate the walk against the generation arithmetic.
  *
  * Synthesized slice payloads are drawn from document text (ASCII ≥
  * 0x20), which contains no zero bytes — so no start-code emulation
  * can occur and emulation-prevention bytes are unnecessary, exactly
  * why the generator can use raw payloads.
  */
object H264Codec {

  val NalSps = 7
  val NalPps = 8
  val NalIdr = 5
  val NalNonIdr = 1

  private val SpsPayload: Array[Byte] = Array(0x42, 0x1e, 0x33).map(_.toByte)
  private val PpsPayload: Array[Byte] = Array(0xce.toByte, 0x38.toByte)

  /** Parsed stream metadata (all read off the bytes). */
  final case class H264Meta(
      nNals: Int, nSps: Int, nPps: Int, nIdr: Int, nNonIdr: Int,
      sliceBytes: Long, streamBytes: Long)

  /** Synthesize an Annex-B stream: SPS, PPS, then `nSlices` slices —
    * every `idrInterval`-th slice (starting at 0) an IDR with a
    * 4-byte start code, the rest non-IDR with 3-byte start codes;
    * slice `s` carries `1 + (s + fill.length) % 24` payload bytes
    * drawn sequentially (cycled) from `fill`. */
  def encode(nSlices: Int, idrInterval: Int, fill: Array[Byte]): Array[Byte] = {
    require(nSlices >= 1 && idrInterval >= 1)
    val src = if (fill.isEmpty) Array[Byte](1) else fill
    val out = new java.io.ByteArrayOutputStream()
    def startCode(four: Boolean): Unit = {
      if (four) out.write(0)
      out.write(0); out.write(0); out.write(1)
    }
    def nalHeader(refIdc: Int, tpe: Int): Unit = out.write((refIdc << 5) | tpe)
    startCode(four = true); nalHeader(3, NalSps); out.write(SpsPayload)
    startCode(four = true); nalHeader(3, NalPps); out.write(PpsPayload)
    var payloadIdx = 0
    var s = 0
    while (s < nSlices) {
      val idr = s % idrInterval == 0
      startCode(four = idr)
      nalHeader(if (idr) 3 else 2, if (idr) NalIdr else NalNonIdr)
      val len = 1 + (s + fill.length) % 24
      var i = 0
      while (i < len) {
        out.write(src(payloadIdx % src.length))
        payloadIdx += 1
        i += 1
      }
      s += 1
    }
    out.toByteArray
  }

  /** Positions of every NAL unit: scan for 00 00 01 (with or without
    * a leading 00), return (headerBytePos, nalEndPos) pairs. */
  private def nalUnits(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += (i + 3) // header byte position
        i += 3
      } else i += 1
    }
    require(starts.nonEmpty, "not an Annex-B stream: no start code found")
    // each NAL runs from its header byte to the next start code's
    // `00 00 01` (the possible extra leading 00 of a 4-byte code is
    // stripped by trailingStartCodeZeros, since payloads are zero-free)
    starts.zip(starts.drop(1).map(h => h - 3) :+ bytes.length).toSeq
  }

  /** Walk the stream: classify every NAL, reject malformed headers,
    * count per type, and sum slice (IDR + non-IDR) payload bytes. */
  def decode(bytes: Array[Byte]): H264Meta = {
    var nSps, nPps, nIdr, nNonIdr, nOther = 0
    var sliceBytes = 0L
    nalUnits(bytes).foreach { case (h, end) =>
      val header = bytes(h) & 0xff
      require((header & 0x80) == 0, s"forbidden_zero_bit set at $h")
      val tpe = header & 0x1f
      // zeros just before the next start code are that code's 4-byte
      // form, not payload
      val len = end - (h + 1) - trailingStartCodeZeros(bytes, h + 1, end)
      tpe match {
        case NalSps => nSps += 1
        case NalPps => nPps += 1
        case NalIdr => nIdr += 1; sliceBytes += len
        case NalNonIdr => nNonIdr += 1; sliceBytes += len
        case _ => nOther += 1
      }
    }
    H264Meta(nSps + nPps + nIdr + nNonIdr + nOther, nSps, nPps, nIdr, nNonIdr,
      sliceBytes, bytes.length.toLong)
  }

  // At most ONE zero immediately before the NEXT start code can belong
  // to that start code (its 4-byte `00 00 00 01` form contributes
  // exactly one byte beyond the `00 00 01` the splitter keyed on). A
  // spec-valid NAL can never contribute more: rbsp_trailing_bits end
  // in a stop bit, so the last payload byte of a well-formed NAL is
  // nonzero. More than one trailing zero therefore means a malformed
  // (or padding-bearing) stream — fail loudly rather than silently
  // misattribute payload bytes to the start code.
  private def trailingStartCodeZeros(bytes: Array[Byte], from: Int, end: Int): Int = {
    if (end >= bytes.length) 0
    else {
      var z = 0
      var i = end - 1
      while (i >= from && bytes(i) == 0) { z += 1; i -= 1 }
      require(z <= 1,
        s"malformed Annex-B: $z trailing zeros before a start code — a " +
          "valid NAL ends with rbsp_trailing_bits (nonzero last byte), " +
          "so at most the 4-byte start code's single extra 00 may trail")
      z
    }
  }

  /** Sum of slice (IDR + non-IDR) payload bytes — the NAL-walk
    * evidence, same role as [[Mp3Codec.payloadSum]]. */
  def slicePayloadSum(bytes: Array[Byte]): Long = {
    var sum = 0L
    nalUnits(bytes).foreach { case (h, end) =>
      val tpe = bytes(h) & 0x1f
      if (tpe == NalIdr || tpe == NalNonIdr) {
        val stop = end - trailingStartCodeZeros(bytes, h + 1, end)
        var i = h + 1
        while (i < stop) { sum += bytes(i) & 0xff; i += 1 }
      }
    }
    sum
  }
}
