package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded MP4 (ISO-BMFF) container metadata. `nSamples` is the
  * `stsz` table's count; `mdatBytes` the `mdat` payload length (a
  * well-formed file has `sum(stsz) == mdatBytes`, which decode
  * REQUIRES — exposing a truncated or size-lying file loudly).
  * `durationMs` = durationTicks * 1000 / timescale, integer math. */
final case class Mp4Meta(width: Int, height: Int, timescale: Int,
    durationTicks: Long, durationMs: Long, nSamples: Int,
    mdatBytes: Long, sampleDelta: Int)

/** Pure-JVM MP4 / ISO-BMFF (ISO 14496-12) container codec — the video
  * container collected data actually arrives in (the r13 verdict's
  * missing #3; the AVI/H.264 members of the family cover RIFF and raw
  * Annex-B). The defining structure is the BOX: `[size u32 BE | type
  * 4cc | payload]`, nested — `moov` (the index: mvhd/trak/tkhd/mdia/
  * mdhd/minf/stbl with stts+stsz tables) + `mdat` (the raw sample
  * bytes). The walk here is head-first like [[TiffCodec]]'s IFD walk:
  * parse `ftyp`, recurse into `moov` for the metadata tables, then
  * account the `mdat` payload against the `stsz` sample sizes — any
  * disagreement (bad size, unknown top-level box, truncation,
  * stsz/mdat mismatch) is a loud IllegalArgumentException. Sample
  * PAYLOAD decode (the actual AV codec inside) stays out of scope, as
  * it genuinely requires media libraries this container doesn't ship
  * — the [[AviCodec]]/[[Mp3Codec]] stance. */
object Mp4Codec {

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Canonical minimal faststart MP4: ftyp, moov (one video track,
    * constant `sampleDelta` ticks per sample), mdat with the given
    * sample payloads back-to-back. */
  def encode(width: Int, height: Int, timescale: Int, sampleDelta: Int,
      samples: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && timescale > 0 && sampleDelta > 0,
      s"bad params ${width}x$height ts=$timescale delta=$sampleDelta")
    require(samples.nonEmpty, "empty sample list")
    val n = samples.length
    val mdatBytes = samples.foldLeft(0L)(_ + _.length)
    val duration = n.toLong * sampleDelta
    require(duration <= Int.MaxValue, s"duration $duration overflows mvhd v0")
    val sttsSize = 24            // 1 entry
    val stszSize = 20 + 4 * n
    val stblSize = 8 + sttsSize + stszSize
    val minfSize = 8 + stblSize
    val mdhdSize = 32
    val mdiaSize = 8 + mdhdSize + minfSize
    val tkhdSize = 92
    val trakSize = 8 + tkhdSize + mdiaSize
    val mvhdSize = 108
    val moovSize = 8 + mvhdSize + trakSize
    val total = 24L + moovSize + 8 + mdatBytes
    require(total <= Int.MaxValue, s"mp4 would be $total bytes")
    val buf = ByteBuffer.allocate(total.toInt).order(ByteOrder.BIG_ENDIAN)
    // --- ftyp ---
    buf.putInt(24).put(cc("ftyp"))
      .put(cc("isom")).putInt(512).put(cc("isom")).put(cc("mp42"))
    // --- moov ---
    buf.putInt(moovSize).put(cc("moov"))
    buf.putInt(mvhdSize).put(cc("mvhd")).putInt(0) // version 0 + flags
      .putInt(0).putInt(0)                         // ctime, mtime
      .putInt(timescale).putInt(duration.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate 1.0, volume, reserved
      .putInt(0).putInt(0)                         // reserved[2]
      .putInt(0x00010000).putInt(0).putInt(0)      // unity matrix rows
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // pre_defined[6]
      .putInt(2)                                   // next_track_ID
    buf.putInt(trakSize).put(cc("trak"))
    buf.putInt(tkhdSize).put(cc("tkhd")).putInt(0x000007) // v0, flags: enabled|in movie|in preview
      .putInt(0).putInt(0)                         // ctime, mtime
      .putInt(1).putInt(0)                         // track_ID, reserved
      .putInt(duration.toInt)
      .putInt(0).putInt(0)                         // reserved[2]
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt_group, volume, reserved
      .putInt(0x00010000).putInt(0).putInt(0)      // unity matrix
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(width << 16).putInt(height << 16)    // 16.16 fixed
    buf.putInt(mdiaSize).put(cc("mdia"))
    buf.putInt(mdhdSize).put(cc("mdhd")).putInt(0)
      .putInt(0).putInt(0)
      .putInt(timescale).putInt(duration.toInt)
      .putShort(0x55C4.toShort).putShort(0)        // language 'und', pre_defined
    buf.putInt(minfSize).put(cc("minf"))
    buf.putInt(stblSize).put(cc("stbl"))
    buf.putInt(sttsSize).put(cc("stts")).putInt(0)
      .putInt(1).putInt(n).putInt(sampleDelta)     // entry_count, (count, delta)
    buf.putInt(stszSize).put(cc("stsz")).putInt(0)
      .putInt(0).putInt(n)                         // sample_size=0 (per-sample table), count
    samples.foreach(s => buf.putInt(s.length))
    // --- mdat ---
    buf.putInt((8 + mdatBytes).toInt).put(cc("mdat"))
    samples.foreach(buf.put)
    require(buf.position() == total.toInt, s"assembly bug: ${buf.position()} != $total")
    buf.array()
  }

  private def boxType(b: Array[Byte], p: Int): String =
    new String(b, p + 4, 4, "US-ASCII")

  /** Walk children of the container box at [start, end); return
    * (type, payloadStart, payloadEnd) triples in file order. */
  private def children(b: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    var p = start
    while (p < end) {
      require(p + 8 <= end, s"box header at $p overruns parent ending $end")
      val size = ByteBuffer.wrap(b, p.toInt, 4).order(ByteOrder.BIG_ENDIAN).getInt.toLong & 0xFFFFFFFFL
      require(size >= 8, s"box '${boxType(b, p.toInt)}' at $p has size $size < 8 (largesize unsupported)")
      require(p + size <= end, s"box '${boxType(b, p.toInt)}' at $p (size $size) overruns parent")
      out += ((boxType(b, p.toInt), p + 8, p + size))
      p += size
    }
    out.toSeq
  }

  private def one(kids: Seq[(String, Long, Long)], t: String): (Long, Long) = {
    val hits = kids.filter(_._1 == t)
    require(hits.size == 1, s"expected exactly one '$t' box, found ${hits.size}")
    (hits.head._2, hits.head._3)
  }

  def decode(bytes: Array[Byte]): Mp4Meta = {
    require(bytes.length >= 32, s"too short for an MP4: ${bytes.length}")
    val top = children(bytes, 0L, bytes.length.toLong)
    require(top.nonEmpty && top.head._1 == "ftyp", s"first box is '${top.head._1}', not ftyp")
    // the scaladoc's "unknown top-level box is loud" promise: a
    // canonical file is EXACTLY ftyp+moov+mdat — a trailing `free` or
    // any other stray box is rejected, not silently skipped
    val alien = top.map(_._1).filterNot(Set("ftyp", "moov", "mdat"))
    require(alien.isEmpty, s"unexpected top-level box(es): ${alien.mkString(",")}")
    val (ftS, _) = one(top, "ftyp")
    val brand = new String(bytes, ftS.toInt, 4, "US-ASCII")
    require(brand == "isom" || brand == "mp42" || brand == "mp41",
      s"alien major brand '$brand'")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val (mvS, mvE) = one(top, "moov")
    val moov = children(bytes, mvS, mvE)
    // mvhd v0: version/flags, ctime, mtime, then timescale + duration
    val (mhS, _) = one(moov, "mvhd")
    require(bytes(mhS.toInt) == 0, "mvhd version != 0 unsupported")
    val timescale = bb.getInt(mhS.toInt + 12)
    val duration = bb.getInt(mhS.toInt + 16).toLong & 0xFFFFFFFFL
    require(timescale > 0, s"mvhd timescale $timescale")
    val (tkS, tkE) = one(moov, "trak")
    val trak = children(bytes, tkS, tkE)
    // tkhd v0: width/height are the LAST two 16.16 fields of the 84-byte payload
    val (thS, thE) = one(trak, "tkhd")
    require(thE - thS == 84, s"tkhd payload ${thE - thS} != 84 (v0)")
    val width = bb.getInt(thE.toInt - 8) >>> 16
    val height = bb.getInt(thE.toInt - 4) >>> 16
    val (mdS, mdE) = one(trak, "mdia")
    val mdia = children(bytes, mdS, mdE)
    val (mhdS, _) = one(mdia, "mdhd")
    val mdhdTs = bb.getInt(mhdS.toInt + 12)
    require(mdhdTs == timescale,
      s"mdhd timescale $mdhdTs != mvhd $timescale (single-track canonical form)")
    val (mfS, mfE) = one(mdia, "minf")
    val (sbS, sbE) = one(children(bytes, mfS, mfE), "stbl")
    val stbl = children(bytes, sbS, sbE)
    val (ttS, ttE) = one(stbl, "stts")
    require(bb.getInt(ttS.toInt + 4) == 1, "stts entry_count != 1 unsupported")
    require(ttE - ttS == 16, s"stts payload ${ttE - ttS} != 16")
    val sttsCount = bb.getInt(ttS.toInt + 8)
    val sampleDelta = bb.getInt(ttS.toInt + 12)
    val (szS, szE) = one(stbl, "stsz")
    require(bb.getInt(szS.toInt + 4) == 0, "fixed stsz sample_size unsupported")
    val nSamples = bb.getInt(szS.toInt + 8)
    require(nSamples == sttsCount, s"stsz count $nSamples != stts count $sttsCount")
    require(szE - szS == 12L + 4L * nSamples,
      s"stsz table ${szE - szS} bytes != ${12L + 4L * nSamples} for $nSamples samples")
    var stszSum = 0L
    var i = 0
    while (i < nSamples) { stszSum += bb.getInt(szS.toInt + 12 + 4 * i); i += 1 }
    val (daS, daE) = one(top, "mdat")
    val mdatBytes = daE - daS
    require(stszSum == mdatBytes,
      s"stsz sizes sum to $stszSum but mdat carries $mdatBytes bytes")
    require(duration == nSamples.toLong * sampleDelta,
      s"mvhd duration $duration != $nSamples samples x $sampleDelta ticks")
    Mp4Meta(width, height, timescale, duration,
      duration * 1000L / timescale, nSamples, mdatBytes, sampleDelta)
  }

  /** Sum of all mdat payload byte values (unsigned) — the payload-
    * accounting pass, same role as [[AviCodec.framePayloadSum]]. */
  def mdatPayloadSum(bytes: Array[Byte]): Long = {
    val top = children(bytes, 0L, bytes.length.toLong)
    val (daS, daE) = one(top, "mdat")
    var s = 0L
    var p = daS.toInt
    while (p < daE.toInt) { s += bytes(p) & 0xFF; p += 1 }
    s
  }
}
