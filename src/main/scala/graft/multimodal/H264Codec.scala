package graft.multimodal

/** H.264/AVC Annex-B codec — NAL-unit AND slice-header level,
  * completing the [[Mp3Codec]]/[[AviCodec]] container-walk family
  * for the compressed video modality: encode synthesizes REAL
  * Annex-B byte streams (both 4-byte and 3-byte start codes, proper
  * NAL header bytes for SPS/PPS/IDR/non-IDR units, and — since r8 —
  * a real exp-Golomb slice header per slice NAL: first_mb_in_slice,
  * slice_type, pic_parameter_set_id, frame_num, idr_pic_id, rbsp
  * stop bit, the ISO 14496-10 §7.3.3 layout), and decode scans the
  * raw bytes for start codes, classifies every NAL, BIT-PARSES each
  * slice header back (ue(v) exp-Golomb decode, loudly rejecting
  * values the fixed parameter sets make impossible), and sums slice
  * data bytes. Only the slice data's CABAC/transform decode needs a
  * media library and stays out of scope; every structure the format
  * defines down to the slice header is parsed for real, so
  * [[MultimodalOps.mmH264]] can hash-gate the walk — header field
  * statistics included — against the generation arithmetic.
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

  /** Parsed stream metadata (all read off the bytes). sliceBytes
    * counts slice DATA only (the parsed slice headers are accounted
    * in hdrBytes); frameNumSum / idrPicIdSum aggregate the
    * exp-Golomb-decoded slice-header fields. */
  final case class H264Meta(
      nNals: Int, nSps: Int, nPps: Int, nIdr: Int, nNonIdr: Int,
      sliceBytes: Long, streamBytes: Long,
      hdrBytes: Long, frameNumSum: Long, idrPicIdSum: Long)

  /** Deterministic slice-header generation arithmetic, shared with
    * the DuckDB oracle (seed = the asset's doc_id): IDR slices carry
    * frame_num 0 (spec: an IDR resets the decoding order) and a
    * seeded idr_pic_id; non-IDR slices count frames modulo the 4-bit
    * field width. */
  def frameNum(sliceIdx: Int, idr: Boolean): Int =
    if (idr) 0 else sliceIdx % 16
  def idrPicId(seed: Long, sliceIdx: Int): Int =
    ((seed + sliceIdx) % 8).toInt

  // exp-Golomb ue(v) bit length: 2·floor(log2(v+1)) + 1
  private def ueLen(v: Int): Int =
    2 * (31 - Integer.numberOfLeadingZeros(v + 1)) + 1

  /** Slice-header byte length (ISO 14496-10 §7.3.3 with our fixed
    * parameter sets: first_mb ue, slice_type ue (7 = all-I IDR /
    * 5 = P), pps_id ue, 4-bit frame_num, idr_pic_id ue for IDR,
    * rbsp stop bit, byte-align). */
  def sliceHeaderLen(idr: Boolean, idrPicIdV: Int): Int = {
    val bits =
      if (idr) 1 + ueLen(7) + 1 + 4 + ueLen(idrPicIdV) + 1
      else 1 + ueLen(5) + 1 + 4 + 1
    (bits + 7) / 8
  }

  // builds the header bytes MSB-first; the field mix can never emit a
  // 0x00 byte (no 8-run of zero bits exists in any value combination:
  // ue prefixes cap at 3 zeros, frame_num at 4, and each byte that
  // could otherwise zero out contains a marker 1 bit), so no
  // start-code emulation is possible — same argument as the payload
  private def buildSliceHeader(idr: Boolean, fn: Int, pid: Int): Array[Byte] = {
    val buf = new Array[Byte](sliceHeaderLen(idr, pid))
    var bit = 0
    def put(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        if (((v >> i) & 1) == 1)
          buf(bit >> 3) = (buf(bit >> 3) | (0x80 >> (bit & 7))).toByte
        bit += 1
        i -= 1
      }
    }
    def putUe(v: Int): Unit = {
      val k = 31 - Integer.numberOfLeadingZeros(v + 1)
      put(0, k)
      put(v + 1, k + 1)
    }
    putUe(0)                  // first_mb_in_slice
    putUe(if (idr) 7 else 5)  // slice_type
    putUe(0)                  // pic_parameter_set_id
    put(fn, 4)                // frame_num (log2_max_frame_num = 4)
    if (idr) putUe(pid)       // idr_pic_id
    put(1, 1)                 // rbsp stop bit; padding zeros implicit
    buf
  }

  // bit reader over a slice header; tracks consumed bits so the
  // caller knows where byte-aligned slice data begins
  private final class SliceBitReader(bytes: Array[Byte], startByte: Int, limit: Int) {
    private val base = startByte * 8
    private var bit = base
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        require((bit >> 3) < limit, "slice header runs past NAL end")
        v = (v << 1) | ((bytes(bit >> 3) >> (7 - (bit & 7))) & 1)
        bit += 1
        i += 1
      }
      v
    }
    def ue(): Int = {
      var k = 0
      while (u(1) == 0) {
        k += 1
        require(k <= 31, "malformed exp-Golomb code")
      }
      var v = 1
      var i = 0
      while (i < k) { v = (v << 1) | u(1); i += 1 }
      v - 1
    }
    def bytesConsumed: Int = (bit - base + 7) / 8
  }

  /** Parse one slice NAL's header starting at `payloadPos`; returns
    * (headerByteLen, frameNum, idrPicId — -1 for non-IDR). Loudly
    * rejects values our fixed parameter sets make impossible. */
  private def parseSliceHeader(bytes: Array[Byte], payloadPos: Int,
      payloadEnd: Int, idr: Boolean): (Int, Int, Int) = {
    val r = new SliceBitReader(bytes, payloadPos, payloadEnd)
    require(r.ue() == 0, s"first_mb_in_slice nonzero at $payloadPos")
    val st = r.ue()
    require(st == (if (idr) 7 else 5),
      s"slice_type $st does not match NAL type at $payloadPos")
    require(r.ue() == 0, s"pic_parameter_set_id nonzero at $payloadPos")
    val fn = r.u(4)
    require(!idr || fn == 0, s"IDR slice with nonzero frame_num $fn")
    val pid = if (idr) r.ue() else -1
    require(pid < 65536, s"idr_pic_id out of range at $payloadPos")
    require(r.u(1) == 1, s"missing rbsp stop bit at $payloadPos")
    (r.bytesConsumed, fn, pid)
  }

  /** Synthesize an Annex-B stream: SPS, PPS, then `nSlices` slices —
    * every `idrInterval`-th slice (starting at 0) an IDR with a
    * 4-byte start code, the rest non-IDR with 3-byte start codes.
    * Each slice NAL carries a REAL exp-Golomb slice header (fields
    * from the seeded arithmetic above) followed by
    * `1 + (s + fill.length) % 24` data bytes drawn sequentially
    * (cycled) from `fill`. */
  def encode(nSlices: Int, idrInterval: Int, fill: Array[Byte],
      seed: Long = 0L): Array[Byte] = {
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
      out.write(buildSliceHeader(idr, frameNum(s, idr), idrPicId(seed, s)))
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
    var hdrBytes = 0L
    var frameNumSum = 0L
    var idrPicIdSum = 0L
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
        case NalIdr | NalNonIdr =>
          val idr = tpe == NalIdr
          if (idr) nIdr += 1 else nNonIdr += 1
          val (hl, fn, pid) = parseSliceHeader(bytes, h + 1,
            end - trailingStartCodeZeros(bytes, h + 1, end), idr)
          hdrBytes += hl
          frameNumSum += fn
          if (idr) idrPicIdSum += pid
          sliceBytes += len - hl
        case _ => nOther += 1
      }
    }
    H264Meta(nSps + nPps + nIdr + nNonIdr + nOther, nSps, nPps, nIdr, nNonIdr,
      sliceBytes, bytes.length.toLong, hdrBytes, frameNumSum, idrPicIdSum)
  }

  // At most ONE zero immediately before the NEXT start code can belong
  // to that start code (its 4-byte `00 00 00 01` form contributes
  // exactly one byte beyond the `00 00 01` the splitter keyed on).
  // NOTE this z<=1 gate enforces THIS REPO'S generation contract
  // (writeStream emits no padding between NAL units), not Annex-B
  // validity in general: ISO 14496-10 Annex B permits arbitrary
  // trailing_zero_8bits between byte-stream NAL units, and
  // cabac_zero_words also yield trailing 0x00 — a general parser
  // would attribute at most one zero to the start code and treat the
  // rest as padding. Here the writer never emits padding, so >1 zeros
  // means the fixture bytes were corrupted — fail loudly rather than
  // silently misattribute payload bytes.
  private def trailingStartCodeZeros(bytes: Array[Byte], from: Int, end: Int): Int = {
    if (end >= bytes.length) 0
    else {
      var z = 0
      var i = end - 1
      while (i >= from && bytes(i) == 0) { z += 1; i -= 1 }
      require(z <= 1,
        s"$z trailing zeros before a start code — this repo's generator " +
          "emits no inter-NAL padding (spec-valid streams MAY carry " +
          "trailing_zero_8bits; this parser is scoped to the in-repo " +
          "contract), so >1 means corrupted fixture bytes")
      z
    }
  }

  /** Sum of slice DATA bytes (parsed slice headers excluded) — the
    * NAL-walk evidence, same role as [[Mp3Codec.payloadSum]]. */
  def slicePayloadSum(bytes: Array[Byte]): Long = {
    var sum = 0L
    nalUnits(bytes).foreach { case (h, end) =>
      val tpe = bytes(h) & 0x1f
      if (tpe == NalIdr || tpe == NalNonIdr) {
        val stop = end - trailingStartCodeZeros(bytes, h + 1, end)
        val (hl, _, _) = parseSliceHeader(bytes, h + 1, stop, tpe == NalIdr)
        var i = h + 1 + hl
        while (i < stop) { sum += bytes(i) & 0xff; i += 1 }
      }
    }
    sum
  }
}
