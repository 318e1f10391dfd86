package graft.multimodal

/** MPEG-1 Layer III (MP3) codec — container AND side-info level.
  *
  * encode synthesizes REAL MP3 frame sequences: valid 11-bit sync,
  * version/layer bits, table-driven bitrate/samplerate indices, the
  * standard `144·bitrate/samplerate (+padding)` frame-length
  * arithmetic, and — since r8 — a bit-exact MPEG-1 side-info block
  * per frame (9-bit main_data_begin, private bits, per-channel scfsi,
  * and the full 59-bit granule-info layout: part2_3_length,
  * big_values, global_gain, scalefac_compress, window-switching flag,
  * table_select ×3, region counts, preflag, scalefac_scale,
  * count1table_select — 17 bytes mono / 32 stereo, the ISO 11172-3
  * §2.4.1.7 layout). decode WALKS the frames off the raw bytes,
  * parses every header field, BIT-READS the side info back (loudly
  * rejecting any structurally impossible value), and sums the main
  * data on the way. The granule fields that carry audio level
  * information (global_gain — the loudness scale — and
  * part2_3_length) are aggregated into per-file statistics that
  * [[MultimodalOps.mmMp3]] hash-gates against the generation
  * arithmetic. Only the Huffman/MDCT spectral synthesis itself is out
  * of scope (it genuinely needs a media library); every field the
  * format DEFINES at container + side-info level is written and
  * parsed for real.
  */
object Mp3Codec {

  /** MPEG-1 Layer III bitrate table (kbps), indices 1..14. */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, indices 0..2. */
  val SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  /** Frame byte length for MPEG-1 Layer III. */
  def frameLength(bitrateIdx: Int, srIdx: Int, padding: Int): Int =
    144 * (BitrateKbps(bitrateIdx) * 1000) / SampleRates(srIdx) + padding

  /** MPEG-1 side-info bytes: 17 mono, 32 stereo (ISO 11172-3). */
  def sideInfoLen(channels: Int): Int = if (channels == 1) 17 else 32

  /** Deterministic side-info generation arithmetic, shared by encode
    * and the DuckDB oracle (seed = the asset's doc_id): */
  def globalGain(seed: Long, frame: Int, granule: Int, ch: Int): Int =
    ((seed + 5L * frame + 3L * granule + ch) % 256).toInt
  def part23Length(seed: Long, frame: Int, granule: Int, ch: Int): Int =
    ((3L * seed + 7L * frame + 11L * granule + 13L * ch) % 4096).toInt

  /** Parsed per-file metadata (all fields read off the bytes).
    * payloadBytes counts MAIN DATA only (headers and side info
    * excluded); sideGainSum / sideP23Sum are the side-info audio
    * statistics Σ global_gain and Σ part2_3_length over every
    * (frame, granule, channel) entry. */
  final case class Mp3Meta(
      sampleRate: Int, bitrateKbps: Int, channels: Int,
      nFrames: Int, payloadBytes: Long, durationMs: Long,
      nGranules: Long, sideGainSum: Long, sideP23Sum: Long)

  // MSB-first bit IO over the side-info region — the layout is not
  // byte-aligned (9/5/3/4-bit fields), so both directions go through
  // these
  private final class BitWriter(buf: Array[Byte], startByte: Int) {
    private var bit = startByte * 8
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >> i) & 1) == 1)
          buf(bit >> 3) = (buf(bit >> 3) | (0x80 >> (bit & 7))).toByte
        bit += 1
        i -= 1
      }
    }
  }
  private final class BitReader(buf: Array[Byte], startByte: Int) {
    private var bit = startByte * 8
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((buf(bit >> 3) >> (7 - (bit & 7))) & 1)
        bit += 1
        i += 1
      }
      v
    }
  }

  /** Synthesize a CBR MP3 frame sequence: `nFrames` frames of the
    * given bitrate/sample-rate/channel-mode, a real side-info block
    * per frame (fields from the seed arithmetic above; structural
    * fields — main_data_begin, scfsi, big_values, table selects —
    * zero, the no-bit-reservoir long-block layout), then main data
    * drawn sequentially from `fill` (cycled). channelMode 3 = mono,
    * else stereo variants — the real header encoding. */
  def encode(bitrateIdx: Int, srIdx: Int, channelMode: Int, nFrames: Int,
      fill: Array[Byte], seed: Long = 0L): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrate index $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"sample-rate index $srIdx")
    val nch = if (channelMode == 3) 1 else 2
    val si = sideInfoLen(nch)
    val flen = frameLength(bitrateIdx, srIdx, 0)
    require(flen >= 4 + si, s"frame length $flen cannot hold side info $si")
    val out = new Array[Byte](flen * nFrames)
    val src = if (fill.isEmpty) Array[Byte](0) else fill
    var pos = 0
    var payloadIdx = 0
    var f = 0
    while (f < nFrames) {
      // header: FF FB = sync(11×1) + MPEG1(11) + LayerIII(01) + noCRC(1)
      out(pos) = 0xff.toByte
      out(pos + 1) = 0xfb.toByte
      // bitrate(4) | samplerate(2) | padding=0(1) | private=0(1)
      out(pos + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
      // channelMode(2) | modeExt/copy/orig/emphasis = 0
      out(pos + 3) = (channelMode << 6).toByte
      // side info (bytes already zero: main_data_begin / private /
      // scfsi and every structural granule field stay 0; only the
      // seeded audio-level fields get written)
      val w = new BitWriter(out, pos + 4)
      w.write(0, 9)                       // main_data_begin: no reservoir
      w.write(0, if (nch == 1) 5 else 3)  // private_bits
      w.write(0, 4 * nch)                 // scfsi
      var g = 0
      while (g < 2) {
        var c = 0
        while (c < nch) {
          w.write(part23Length(seed, f, g, c), 12)
          w.write(0, 9)                   // big_values
          w.write(globalGain(seed, f, g, c), 8)
          w.write(0, 4)                   // scalefac_compress
          w.write(0, 1)                   // window_switching_flag
          w.write(0, 15)                  // table_select ×3
          w.write(0, 4)                   // region0_count
          w.write(0, 3)                   // region1_count
          w.write(0, 1)                   // preflag
          w.write(0, 1)                   // scalefac_scale
          w.write(0, 1)                   // count1table_select
          c += 1
        }
        g += 1
      }
      var i = 4 + si
      while (i < flen) {
        out(pos + i) = src(payloadIdx % src.length)
        payloadIdx += 1
        i += 1
      }
      pos += flen
      f += 1
    }
    out
  }

  /** Walk the frame sequence: parse each header, verify sync and the
    * MPEG1/LayerIII bits, bit-parse the side info (rejecting values
    * the generation contract and the no-reservoir layout make
    * impossible), skip by the COMPUTED frame length, and sum main
    * data bytes and side-info statistics on the way. Fails loudly on
    * a broken stream. */
  def decode(bytes: Array[Byte]): Mp3Meta = {
    require(bytes.length >= 4, "not an MP3 stream: too short")
    var pos = 0
    var nFrames = 0
    var payloadBytes = 0L
    var sampleRate = -1
    var bitrate = -1
    var channels = -1
    var nGranules = 0L
    var gainSum = 0L
    var p23Sum = 0L
    while (pos + 4 <= bytes.length) {
      val b0 = bytes(pos) & 0xff
      val b1 = bytes(pos + 1) & 0xff
      require(b0 == 0xff && (b1 & 0xe0) == 0xe0, f"bad frame sync at $pos")
      require((b1 & 0x18) == 0x18, "not MPEG-1")
      require((b1 & 0x06) == 0x02, "not Layer III")
      val b2 = bytes(pos + 2) & 0xff
      val bIdx = (b2 >> 4) & 0xf
      val sIdx = (b2 >> 2) & 0x3
      require(bIdx >= 1 && bIdx <= 14, s"bad bitrate index $bIdx")
      require(sIdx <= 2, s"bad sample-rate index $sIdx")
      val padding = (b2 >> 1) & 0x1
      val mode = ((bytes(pos + 3) & 0xff) >> 6) & 0x3
      val nch = if (mode == 3) 1 else 2
      val si = sideInfoLen(nch)
      val flen = frameLength(bIdx, sIdx, padding)
      require(pos + flen <= bytes.length, s"truncated frame at $pos")
      require(flen >= 4 + si, s"frame at $pos too short for side info")
      // side info: bit-exact parse of the ISO layout
      val r = new BitReader(bytes, pos + 4)
      require(r.read(9) == 0, s"frame $nFrames: bit reservoir unsupported (main_data_begin != 0)")
      require(r.read(if (nch == 1) 5 else 3) == 0, s"frame $nFrames: private bits set")
      require(r.read(4 * nch) == 0, s"frame $nFrames: scfsi set")
      var g = 0
      while (g < 2) {
        var c = 0
        while (c < nch) {
          p23Sum += r.read(12)            // part2_3_length
          require(r.read(9) == 0, s"frame $nFrames g$g c$c: big_values nonzero")
          gainSum += r.read(8)            // global_gain
          require(r.read(4) == 0, s"frame $nFrames g$g c$c: scalefac_compress nonzero")
          require(r.read(1) == 0, s"frame $nFrames g$g c$c: window switching unsupported")
          require(r.read(15) == 0, s"frame $nFrames g$g c$c: table_select nonzero")
          require(r.read(7) == 0, s"frame $nFrames g$g c$c: region counts nonzero")
          require(r.read(3) == 0, s"frame $nFrames g$g c$c: preflag/scale/count1 set")
          nGranules += 1
          c += 1
        }
        g += 1
      }
      sampleRate = SampleRates(sIdx)
      bitrate = BitrateKbps(bIdx)
      channels = nch
      payloadBytes += flen - 4 - si
      nFrames += 1
      pos += flen
    }
    require(pos == bytes.length, "trailing garbage after last frame")
    Mp3Meta(sampleRate, bitrate, channels, nFrames, payloadBytes,
      nFrames.toLong * SamplesPerFrame * 1000 / sampleRate,
      nGranules, gainSum, p23Sum)
  }

  /** Sum of all MAIN DATA bytes (headers and side info excluded) —
    * the frame-walk evidence, same role as [[AviCodec]]'s
    * framePayloadSum. */
  def payloadSum(bytes: Array[Byte]): Long = {
    var pos = 0
    var sum = 0L
    while (pos + 4 <= bytes.length) {
      val b2 = bytes(pos + 2) & 0xff
      val flen = frameLength((b2 >> 4) & 0xf, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1)
      val mode = ((bytes(pos + 3) & 0xff) >> 6) & 0x3
      var i = 4 + sideInfoLen(if (mode == 3) 1 else 2)
      while (i < flen) { sum += bytes(pos + i) & 0xff; i += 1 }
      pos += flen
    }
    sum
  }
}
