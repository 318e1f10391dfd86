package graft.multimodal

/** Parsed FLAC STREAMINFO metadata. */
final case class FlacMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
    totalSamples: Long, md5Hex: String)

/** Pure-JVM FLAC container codec — the bit-packed metadata format of
  * the lossless-audio world: a "fLaC" magic, a chain of
  * METADATA_BLOCK headers (last-flag bit + 7-bit type + 24-bit
  * length), and a STREAMINFO block whose core fields are packed at
  * sub-byte offsets (20-bit sample rate, 3-bit channels-1, 5-bit
  * bps-1, 36-bit total samples) next to an MD5 of the unencoded
  * audio. Encoding writes the canonical STREAMINFO(+PADDING) chain
  * with the raw payload appended where frames would sit; decoding
  * walks the chain, unpacks the bitfields, and VERIFIES the payload
  * MD5 against the header claim — the integrity check a real audio
  * ingest runs before trusting a file. Fails loudly on alien bytes,
  * truncated blocks, or an MD5 mismatch. */
object FlacCodec {

  private def md5(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)

  def encode(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, payload: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"bad channels $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bad bps $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"bad total $totalSamples")
    val info = new Array[Byte](34)
    // min/max blocksize (4608), min/max framesize (0 = unknown)
    info(0) = 0x12; info(1) = 0x00; info(2) = 0x12; info(3) = 0x00
    // bytes 10..17: rate(20) | ch-1(3) | bps-1(5) | total(36), MSB-first
    var packed = 0L
    packed |= sampleRate.toLong << 44
    packed |= (channels - 1).toLong << 41
    packed |= (bitsPerSample - 1).toLong << 36
    packed |= totalSamples
    for (i <- 0 until 8) info(10 + i) = (packed >>> (56 - 8 * i)).toByte
    val dig = md5(payload)
    System.arraycopy(dig, 0, info, 18, 16)
    val out = java.nio.ByteBuffer.allocate(4 + 4 + 34 + 4 + 2 + payload.length)
    out.put("fLaC".getBytes("US-ASCII"))
    out.put(0x00.toByte).put(0x00.toByte).put(0x00.toByte).put(34.toByte)
    out.put(info)
    // a 2-byte PADDING block carrying the last-block flag
    out.put((0x80 | 0x01).toByte).put(0x00.toByte).put(0x00.toByte).put(2.toByte)
    out.put(0x00.toByte).put(0x00.toByte)
    out.put(payload)
    out.array()
  }

  def decode(bytes: Array[Byte]): FlacMeta = {
    require(bytes.length >= 4 + 4 + 34,
      s"too short for a FLAC stream: ${bytes.length}")
    require(new String(bytes, 0, 4, "US-ASCII") == "fLaC", "no fLaC magic")
    var p = 4L
    var info: Option[Int] = None // offset of the STREAMINFO body
    var last = false
    var first = true
    while (!last) {
      require(p + 4 <= bytes.length, s"metadata chain overruns file at $p")
      val head = bytes(p.toInt) & 0xFF
      last = (head & 0x80) != 0
      val tpe = head & 0x7F
      val len = ((bytes(p.toInt + 1) & 0xFF) << 16) |
        ((bytes(p.toInt + 2) & 0xFF) << 8) | (bytes(p.toInt + 3) & 0xFF)
      require(p + 4 + len <= bytes.length, s"block (type $tpe, len $len) overruns file")
      if (first) {
        require(tpe == 0, s"first metadata block must be STREAMINFO, got type $tpe")
        require(len == 34, s"STREAMINFO must be 34 bytes, got $len")
        info = Some(p.toInt + 4)
        first = false
      }
      p += 4 + len
    }
    val o = info.get
    var packed = 0L
    for (i <- 0 until 8) packed = (packed << 8) | (bytes(o + 10 + i) & 0xFFL)
    val rate = (packed >>> 44).toInt
    val ch = ((packed >>> 41) & 0x7).toInt + 1
    val bps = ((packed >>> 36) & 0x1F).toInt + 1
    val total = packed & ((1L << 36) - 1)
    require(rate > 0, "sample rate 0 is invalid outside pure-metadata streams")
    val claimed = bytes.slice(o + 18, o + 34)
    val payload = bytes.slice(p.toInt, bytes.length)
    require(java.util.Arrays.equals(md5(payload), claimed),
      "payload MD5 does not match the STREAMINFO claim")
    FlacMeta(rate, ch, bps, total, claimed.map("%02x".format(_)).mkString)
  }
}
