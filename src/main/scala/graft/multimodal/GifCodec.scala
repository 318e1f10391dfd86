package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Decoded GIF metadata. `paletteSize` is the global color table's
  * entry count; `minCodeSize` the LZW seed width from the image data
  * stream; `nPixels` the decompressed index count (must equal w×h). */
final case class GifMeta(width: Int, height: Int, paletteSize: Int,
    minCodeSize: Int, nPixels: Long)

/** Pure-JVM GIF89a codec — the third REAL image decoder after
  * [[BmpCodec]] (uncompressed) and [[PngCodec]] (deflate): GIF brings
  * the remaining classic compression family, a from-scratch LZW with
  * variable-width codes (9→12 bits, LSB-first bit packing, clear-code
  * dictionary resets at 4096 entries) under the standard container
  * walk (header, logical screen descriptor, global color table, image
  * descriptor, 255-byte data sub-blocks, trailer).
  *
  * Encodes canonical single-frame 256-entry-grayscale-palette images;
  * decodes any single-frame GIF87a/89a with a global color table,
  * skipping extension blocks (GCE, comments, application) the way a
  * real file walk must. Fails loudly on bad magic, missing color
  * table, interlace (not supported), or an LZW stream whose pixel
  * count disagrees with the declared dimensions — alien bytes at
  * 100 TB surface as errors, not silently-zero features.
  */
object GifCodec {

  private val MaxWidth = 12
  private val DictCap = 1 << MaxWidth // 4096

  /** Canonical GIF89a encoding: 256-entry grayscale global palette,
    * one image, `indices` are palette indices (bytes, unsigned),
    * exactly width*height of them. */
  def encode(width: Int, height: Int, indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(indices.length == width * height,
      s"${indices.length} indices for ${width}x$height")
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    val lsd = ByteBuffer.allocate(7).order(ByteOrder.LITTLE_ENDIAN)
    lsd.putShort(width.toShort).putShort(height.toShort)
    // packed: global color table, 8 bits/channel, unsorted, 256 entries
    lsd.put(0xF7.toByte).put(0.toByte).put(0.toByte)
    out.write(lsd.array())
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    val desc = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    desc.put(0x2C.toByte) // image separator
    desc.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    desc.put(0.toByte) // no local color table, not interlaced
    out.write(desc.array())
    val minCodeSize = 8
    out.write(minCodeSize)
    val compressed = lzwEncode(minCodeSize, indices)
    var off = 0
    while (off < compressed.length) { // 255-byte sub-blocks
      val n = math.min(255, compressed.length - off)
      out.write(n)
      out.write(compressed, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Parse the container and decompress the image stream. */
  def decode(payload: Array[Byte]): GifMeta = {
    val (meta, _) = decodeWithPixels(payload)
    meta
  }

  /** Sum of the decoded palette indices (unsigned) — the full-payload
    * probe proving every pixel came back through LZW. */
  def pixelSum(payload: Array[Byte]): Long = {
    val (_, px) = decodeWithPixels(payload)
    var s = 0L; var i = 0
    while (i < px.length) { s += px(i) & 0xff; i += 1 }
    s
  }

  private def decodeWithPixels(payload: Array[Byte]): (GifMeta, Array[Byte]) = {
    require(payload.length >= 13, s"not GIF: only ${payload.length} bytes")
    val magic = new String(payload, 0, 6, "US-ASCII")
    require(magic == "GIF89a" || magic == "GIF87a", s"not GIF: magic '$magic'")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(6)
    val sw = buf.getShort & 0xffff
    val sh = buf.getShort & 0xffff
    val packed = buf.get() & 0xff
    buf.get(); buf.get() // background color index, aspect ratio
    require((packed & 0x80) != 0, "no global color table")
    val paletteSize = 1 << ((packed & 0x07) + 1)
    buf.position(buf.position() + paletteSize * 3)
    // block walk: skip extensions until the image descriptor
    var sep = buf.get() & 0xff
    while (sep == 0x21) { // extension introducer
      buf.get() // label
      var bs = buf.get() & 0xff
      while (bs != 0) { buf.position(buf.position() + bs); bs = buf.get() & 0xff }
      sep = buf.get() & 0xff
    }
    require(sep == 0x2C, f"expected image descriptor, got 0x$sep%02x")
    buf.getShort(); buf.getShort() // left, top
    val w = buf.getShort & 0xffff
    val h = buf.getShort & 0xffff
    val ipacked = buf.get() & 0xff
    require((ipacked & 0x40) == 0, "interlaced GIF not supported")
    if ((ipacked & 0x80) != 0) buf.position(buf.position() + (1 << ((ipacked & 0x07) + 1)) * 3)
    val minCodeSize = buf.get() & 0xff
    require(minCodeSize >= 2 && minCodeSize <= 8, s"bad LZW min code size $minCodeSize")
    val data = new ByteArrayOutputStream()
    var bs = buf.get() & 0xff
    while (bs != 0) {
      data.write(payload, buf.position(), bs)
      buf.position(buf.position() + bs)
      bs = buf.get() & 0xff
    }
    val pixels = lzwDecode(minCodeSize, data.toByteArray)
    require(pixels.length == w * h,
      s"LZW stream decoded ${pixels.length} pixels for ${w}x$h")
    (GifMeta(sw, sh, paletteSize, minCodeSize, pixels.length.toLong), pixels)
  }

  // ---- LZW (GIF variable-width variant) -------------------------------

  /** LSB-first bit writer. */
  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
  }

  /** GIF LZW: dictionary seeds with 2^min single-index codes plus
    * clear (2^min) and end-of-information (2^min+1); codes start at
    * min+1 bits and widen when the next assignable code would not fit
    * (next == 1<<width), capping at 12; a full dictionary emits clear
    * and resets — both sides apply the identical rule, which is what
    * keeps a multi-reset stream in sync. */
  private[multimodal] def lzwEncode(minCodeSize: Int, data: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new BitWriter
    var width = minCodeSize + 1
    var next = eoi + 1
    val dict = mutable.HashMap.empty[(Int, Int), Int]
    bw.put(clear, width)
    if (data.isEmpty) { bw.put(eoi, width); return bw.finish() }
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xff
      dict.get((cur, k)) match {
        case Some(c) => cur = c
        case None =>
          bw.put(cur, width)
          if (next < DictCap) {
            dict.update((cur, k), next)
            next += 1
            // bump AFTER code value 2^width has been assigned: that
            // entry can only be emitted later, by which point codes
            // are width+1 bits — this is the convention real decoders
            // (giflib, ImageIO) expect, paired with the decoder's
            // bump-at-2^width below
            if (next == (1 << width) + 1 && width < MaxWidth) width += 1
          } else {
            bw.put(clear, width)
            dict.clear()
            width = minCodeSize + 1
            next = eoi + 1
          }
          cur = k
      }
      i += 1
    }
    bw.put(cur, width)
    bw.put(eoi, width)
    bw.finish()
  }

  /** LSB-first bit reader. */
  private final class BitReader(data: Array[Byte]) {
    private var acc = 0L
    private var nBits = 0
    private var pos = 0
    def get(width: Int): Int = {
      while (nBits < width) {
        require(pos < data.length, "LZW stream truncated")
        acc |= (data(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width
      v
    }
  }

  private[multimodal] def lzwDecode(minCodeSize: Int, data: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val br = new BitReader(data)
    val out = new ByteArrayOutputStream()
    // dictionary as (prefix code, appended index); single-index codes
    // reconstruct implicitly
    val prefix = new Array[Int](DictCap)
    val append = new Array[Byte](DictCap)
    var width = minCodeSize + 1
    var next = eoi + 1
    var prev = -1

    val stack = new Array[Byte](DictCap)
    def emit(code: Int): Byte = { // writes the string, returns its FIRST index
      var c = code
      var sp = 0
      while (c >= clear) { stack(sp) = append(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp) & 0xff) }
      first
    }
    def firstIndex(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }

    var code = br.get(width)
    while (code != eoi) {
      if (code == clear) {
        width = minCodeSize + 1
        next = eoi + 1
        prev = -1
      } else if (prev < 0) {
        require(code < clear, s"first code $code after clear must be a literal")
        emit(code)
        prev = code
      } else {
        val first =
          if (code < next) emit(code)
          else if (code == next) {
            // KwKwK: the code being defined RIGHT NOW — its string is
            // prev's string plus prev's own first index
            val f = firstIndex(prev)
            emit(prev)
            out.write(f & 0xff)
            f
          } else sys.error(s"bad LZW code $code (next=$next)")
        if (next < DictCap) {
          prefix(next) = prev
          append(next) = first
          next += 1
          // one entry EARLIER than the encoder's bump: the decoder's
          // dictionary lags by one (it learns entry n from the code
          // AFTER the one that created it), so with the encoder
          // bumping at 2^width+1, the decoder bumps at 2^width
          if (next == (1 << width) && width < MaxWidth) width += 1
        }
        prev = code
      }
      code = br.get(width)
    }
    out.toByteArray
  }
}
