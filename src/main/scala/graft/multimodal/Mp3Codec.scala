package graft.multimodal

/** MPEG-1 Layer III (MP3) container codec — frame-header level, the
  * [[AviCodec]] pattern applied to the last stubbed audio modality:
  * encode synthesizes REAL MP3 frame sequences (valid 11-bit sync,
  * version/layer bits, table-driven bitrate/samplerate indices, the
  * standard `144·bitrate/samplerate (+padding)` frame-length
  * arithmetic), and decode WALKS the frames off the raw bytes —
  * parsing every header field and physically skipping each frame by
  * its computed length, summing payload bytes on the way. What stays
  * out of scope is the audio payload's Huffman/MDCT decode, which
  * genuinely needs a media library; every container-level field the
  * format defines is parsed for real, so [[MultimodalOps.mmMp3]] can
  * hash-gate the full header walk + payload byte sum against the
  * generation arithmetic.
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

  /** Parsed per-file metadata (all fields read off the bytes). */
  final case class Mp3Meta(
      sampleRate: Int, bitrateKbps: Int, channels: Int,
      nFrames: Int, payloadBytes: Long, durationMs: Long)

  /** Synthesize a CBR MP3 frame sequence: `nFrames` frames of the
    * given bitrate/sample-rate/channel-mode, payload bytes drawn
    * sequentially from `fill` (cycled). channelMode 3 = mono, else
    * stereo variants — the real header encoding. */
  def encode(bitrateIdx: Int, srIdx: Int, channelMode: Int, nFrames: Int,
      fill: Array[Byte]): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrate index $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"sample-rate index $srIdx")
    val flen = frameLength(bitrateIdx, srIdx, 0)
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
      var i = 4
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
    * MPEG1/LayerIII bits, skip by the COMPUTED frame length, sum the
    * payload bytes. Fails loudly on a broken stream. */
  def decode(bytes: Array[Byte]): Mp3Meta = {
    require(bytes.length >= 4, "not an MP3 stream: too short")
    var pos = 0
    var nFrames = 0
    var payloadBytes = 0L
    var sampleRate = -1
    var bitrate = -1
    var channels = -1
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
      val flen = frameLength(bIdx, sIdx, padding)
      require(pos + flen <= bytes.length, s"truncated frame at $pos")
      sampleRate = SampleRates(sIdx)
      bitrate = BitrateKbps(bIdx)
      channels = if (mode == 3) 1 else 2
      payloadBytes += flen - 4
      nFrames += 1
      pos += flen
    }
    require(pos == bytes.length, "trailing garbage after last frame")
    Mp3Meta(sampleRate, bitrate, channels, nFrames, payloadBytes,
      nFrames.toLong * SamplesPerFrame * 1000 / sampleRate)
  }

  /** Sum of all payload bytes (headers excluded) — the frame-walk
    * evidence, same role as [[AviCodec]]'s framePayloadSum. */
  def payloadSum(bytes: Array[Byte]): Long = {
    var pos = 0
    var sum = 0L
    while (pos + 4 <= bytes.length) {
      val b2 = bytes(pos + 2) & 0xff
      val flen = frameLength((b2 >> 4) & 0xf, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1)
      var i = 4
      while (i < flen) { sum += bytes(pos + i) & 0xff; i += 1 }
      pos += flen
    }
    sum
  }
}
