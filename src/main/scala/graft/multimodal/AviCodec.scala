package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded AVI container metadata. `nFrames` is the main-header frame
  * count; `framesPresent` is the number of video chunks actually
  * found in the `movi` list (a well-formed file has them equal —
  * exposing both lets a pipeline detect truncated files);
  * `durationMs` = nFrames * microSecPerFrame / 1000, integer math. */
final case class AviMeta(width: Int, height: Int, nFrames: Int,
    microSecPerFrame: Int, fpsRate: Int, fpsScale: Int,
    framesPresent: Int, moviBytes: Long, durationMs: Long)

/** Pure-JVM AVI container codec — the video member of the real-codec
  * family ([[WavCodec]], [[BmpCodec]]): RIFF `AVI ` with an `hdrl`
  * LIST (avih main header + strl/strh video stream header) and a
  * `movi` LIST of `00dc` frame chunks. The CONTAINER is fully real —
  * header fields parsed, frame chunks walked and counted, odd-size
  * padding honored, loud failure on alien bytes. Only the frame
  * PAYLOAD decode (the actual video codec) remains out of scope, as
  * it genuinely requires codec libraries this container doesn't ship.
  */
object AviCodec {

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Canonical minimal AVI: one video stream, `frames.length` `00dc`
    * chunks. `fpsRate`/`fpsScale` is the stream's rational frame rate;
    * `microSecPerFrame` the main-header period. */
  def encode(width: Int, height: Int, microSecPerFrame: Int,
      fpsRate: Int, fpsScale: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && microSecPerFrame > 0 && fpsRate > 0 && fpsScale > 0,
      s"bad params ${width}x$height usec=$microSecPerFrame fps=$fpsRate/$fpsScale")
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' + avih + LIST strl(strh+strf)
    val riffBody = 4 + (8 + hdrlSize) + (8 + 4 + moviBody) // 'AVI ' + LIST hdrl + LIST movi
    val buf = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(cc("RIFF")).putInt(riffBody).put(cc("AVI "))
    // --- LIST hdrl ---
    buf.put(cc("LIST")).putInt(hdrlSize).put(cc("hdrl"))
    buf.put(cc("avih")).putInt(56)
      .putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0) // usec, maxBytes, padding, flags
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)    // totalFrames, initial, streams, bufSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)                // reserved[4]
    buf.put(cc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(cc("strl"))
    buf.put(cc("strh")).putInt(56)
      .put(cc("vids")).put(cc("DIB "))                        // type, handler
      .putInt(0).putShort(0).putShort(0).putInt(0)            // flags, priority, language, initialFrames
      .putInt(fpsScale).putInt(fpsRate)                       // scale, rate (fps = rate/scale)
      .putInt(0).putInt(frames.length).putInt(0)              // start, length, bufSize
      .putInt(-1).putInt(0)                                   // quality, sampleSize
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort) // rcFrame
    buf.put(cc("strf")).putInt(40)                            // BITMAPINFOHEADER
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0)
      .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    // --- LIST movi ---
    buf.put(cc("LIST")).putInt(4 + moviBody).put(cc("movi"))
    frames.foreach { f =>
      buf.put(cc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte) // RIFF odd-size pad
    }
    buf.array()
  }

  private def fourCC(buf: ByteBuffer): String = {
    val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
  }

  /** Parse an AVI container: avih main header, the first video strh
    * (rate/scale), and a real walk of the movi list counting frame
    * chunks. Throws IllegalArgumentException on non-AVI input. */
  def decode(payload: Array[Byte]): AviMeta = {
    require(payload.length >= 12, s"not RIFF: only ${payload.length} bytes")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(fourCC(buf) == "RIFF", "not RIFF: bad magic")
    buf.getInt
    require(fourCC(buf) == "AVI ", "RIFF but not AVI")
    var width = -1; var height = -1; var nFrames = -1; var usec = -1
    var rate = -1; var scale = -1
    var framesPresent = 0; var moviBytes = 0L; var sawMovi = false
    while (buf.remaining >= 8) {
      val id = fourCC(buf)
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining,
        s"chunk '$id' claims $size bytes, ${buf.remaining} remain")
      val end = buf.position() + size + (size & 1)
      if (id == "LIST") {
        val listType = fourCC(buf)
        if (listType == "movi") {
          sawMovi = true
          // real frame walk: count video chunks ('##dc' compressed /
          // '##db' uncompressed), skipping any interleaved audio/index
          while (buf.position() < end && end - buf.position() >= 8) {
            val cid = fourCC(buf)
            val csize = buf.getInt
            require(csize >= 0 && buf.position() + csize <= end,
              s"movi chunk '$cid' overruns the list")
            if (cid.endsWith("dc") || cid.endsWith("db")) {
              framesPresent += 1; moviBytes += csize
            }
            buf.position(buf.position() + csize + (csize & 1))
          }
          buf.position(end) // snap past any sub-8-byte trailing slack
        }
        // hdrl/strl: fall through WITHOUT skipping to end — the walk
        // descends into the list and visits avih/strh as ordinary
        // chunks (RIFF lists are just framed chunk sequences)
      } else if (id == "avih") {
        require(size >= 40, s"avih too short: $size")
        usec = buf.getInt; buf.getInt; buf.getInt; buf.getInt
        nFrames = buf.getInt; buf.getInt; buf.getInt; buf.getInt
        width = buf.getInt; height = buf.getInt
        buf.position(end)
      } else if (id == "strh") {
        require(size >= 36, s"strh too short: $size")
        val streamType = fourCC(buf)
        if (streamType == "vids" && rate < 0) {
          buf.position(buf.position() + 16) // handler, flags, prio/lang, initialFrames
          scale = buf.getInt; rate = buf.getInt
        }
        buf.position(end)
      } else {
        buf.position(end) // strf/JUNK/idx1/vedt/…
      }
    }
    require(width > 0 && height > 0 && nFrames >= 0 && usec > 0, "no avih header")
    require(rate > 0 && scale > 0, "no video strh header")
    require(sawMovi, "no movi list")
    AviMeta(width, height, nFrames, usec, rate, scale,
      framesPresent, moviBytes, nFrames.toLong * usec / 1000L)
  }

  /** Frame PAYLOAD decode: walk the movi list and sum the unsigned
    * bytes of every video chunk's payload (skipping chunk headers and
    * odd-size pad bytes). The oracle recomputes the sum from the
    * generation's cycled text slices, so a walker that miscounts a
    * header or reads a pad byte hash-mismatches. */
  def framePayloadSum(payload: Array[Byte]): Long = {
    require(payload.length >= 12, s"not RIFF: only ${payload.length} bytes")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(fourCC(buf) == "RIFF", "not RIFF: bad magic")
    buf.getInt
    require(fourCC(buf) == "AVI ", "RIFF but not AVI")
    var sum = 0L; var sawMovi = false
    while (buf.remaining >= 8) {
      val id = fourCC(buf)
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining,
        s"chunk '$id' claims $size bytes, ${buf.remaining} remain")
      val end = buf.position() + size + (size & 1)
      if (id == "LIST") {
        val listType = fourCC(buf)
        if (listType == "movi") {
          sawMovi = true
          while (buf.position() < end && end - buf.position() >= 8) {
            val cid = fourCC(buf)
            val csize = buf.getInt
            require(csize >= 0 && buf.position() + csize <= end,
              s"movi chunk '$cid' overruns the list")
            if (cid.endsWith("dc") || cid.endsWith("db")) {
              var i = 0
              while (i < csize) { sum += (buf.get(buf.position() + i) & 0xff); i += 1 }
            }
            buf.position(buf.position() + csize + (csize & 1))
          }
          buf.position(end)
        }
      } else {
        buf.position(end)
      }
    }
    require(sawMovi, "no movi list")
    sum
  }
}
