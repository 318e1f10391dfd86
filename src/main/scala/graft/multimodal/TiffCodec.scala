package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded TIFF metadata for a single-strip baseline RGB image. */
final case class TiffMeta(width: Int, height: Int, samplesPerPixel: Int,
    bitsPerSample: Int, rowsPerStrip: Int, stripOffset: Int, stripBytes: Int)

/** Pure-JVM baseline TIFF codec — the tagged-container image format
  * next to [[BmpCodec]]'s fixed-header one: TIFF is metadata as a
  * TABLE (the IFD: sorted 12-byte tag entries with inline-or-offset
  * values), which is exactly the layout every scientific/scan corpus
  * ships, and parsing it means a real directory walk rather than
  * fixed-offset field reads. No image library: encodes canonical
  * little-endian ("II") single-strip uncompressed 8-bit RGB, decodes
  * any same-family file by walking the IFD, resolving the
  * out-of-line BitsPerSample triple, and bounds-checking the strip
  * against the payload. Fails loudly on non-TIFF, compressed, tiled,
  * or multi-strip input — alien bytes at 100 TB must surface as
  * errors, not silently-zero features.
  *
  * Canonical layout written by [[encode]] (and assumed nowhere in
  * [[decode]], which follows the IFD pointer wherever it goes):
  * 8-byte header → IFD (9 entries) at offset 8 → external
  * BitsPerSample shorts at 122 → pixel strip at [[PixelOffset]].
  */
object TiffCodec {

  /** Fixed strip offset of the canonical encoding: 8 (header) + 114
    * (9-entry IFD) + 6 (external BitsPerSample 8,8,8). */
  val PixelOffset = 128

  private val TagWidth = 256
  private val TagHeight = 257
  private val TagBits = 258
  private val TagCompression = 259
  private val TagPhotometric = 262
  private val TagStripOffsets = 273
  private val TagSamplesPerPixel = 277
  private val TagRowsPerStrip = 278
  private val TagStripByteCounts = 279

  /** Canonical single-strip 8-bit RGB encoding. `pixels` is row-major
    * RGB, exactly width*height*3 bytes (TIFF rows are unpadded,
    * unlike BMP's 4-byte-aligned strides). */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"${pixels.length} pixel bytes for ${width}x$height*3")
    val buf = ByteBuffer.allocate(PixelOffset + pixels.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    buf.putShort(9) // entry count
    def entry(tag: Int, tpe: Int, count: Int, value: Int): Unit = {
      buf.putShort(tag.toShort).putShort(tpe.toShort).putInt(count)
      if (tpe == 3 && count == 1) buf.putShort(value.toShort).putShort(0)
      else buf.putInt(value)
    }
    entry(TagWidth, 3, 1, width)
    entry(TagHeight, 3, 1, height)
    entry(TagBits, 3, 3, 122) // > 4 bytes: offset to the external shorts
    entry(TagCompression, 3, 1, 1) // uncompressed
    entry(TagPhotometric, 3, 1, 2) // RGB
    entry(TagStripOffsets, 4, 1, PixelOffset)
    entry(TagSamplesPerPixel, 3, 1, 3)
    entry(TagRowsPerStrip, 3, 1, height) // ONE strip
    entry(TagStripByteCounts, 4, 1, pixels.length)
    buf.putInt(0) // no next IFD
    buf.putShort(8).putShort(8).putShort(8) // external BitsPerSample
    buf.put(pixels)
    buf.array()
  }

  /** Parse a baseline single-strip RGB TIFF by walking its IFD.
    * Throws IllegalArgumentException on anything outside that family. */
  def decode(payload: Array[Byte]): TiffMeta = {
    require(payload.length >= 8, s"not TIFF: only ${payload.length} bytes")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'I'.toByte && buf.get() == 'I'.toByte,
      "not TIFF: bad byte-order mark (big-endian MM unsupported)")
    require(buf.getShort() == 42, "not TIFF: bad magic")
    val ifd = buf.getInt()
    // offset/size arithmetic in Long: an adversarial ifd near
    // Int.MaxValue would otherwise wrap the bound checks and surface
    // as IndexOutOfBounds instead of the documented IllegalArgument
    require(ifd >= 8 && ifd.toLong + 2 <= payload.length, s"IFD offset $ifd outside file")
    val n = buf.getShort(ifd) & 0xffff
    require(ifd.toLong + 2 + n * 12 + 4 <= payload.length, s"$n-entry IFD truncated")
    // tag → (type, count, rawValueField)
    var tags = Map.empty[Int, (Int, Int, Int)]
    var i = 0
    while (i < n) {
      val base = ifd + 2 + i * 12
      val tag = buf.getShort(base) & 0xffff
      val tpe = buf.getShort(base + 2) & 0xffff
      val cnt = buf.getInt(base + 4)
      tags += tag -> (tpe, cnt, buf.getInt(base + 8))
      i += 1
    }
    // SHORT(3) count-1 values live in the field's low two bytes (LE)
    def shortOrLong(tag: Int): Int = {
      val (tpe, cnt, raw) = tags.getOrElse(tag,
        throw new IllegalArgumentException(s"missing required tag $tag"))
      require(cnt == 1, s"tag $tag: count $cnt unsupported (want 1)")
      tpe match {
        case 3 => raw & 0xffff
        case 4 => raw
        case t => throw new IllegalArgumentException(s"tag $tag: type $t unsupported")
      }
    }
    val width = shortOrLong(TagWidth)
    val height = shortOrLong(TagHeight)
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(shortOrLong(TagCompression) == 1, "compressed TIFF unsupported")
    require(shortOrLong(TagPhotometric) == 2, "non-RGB photometric unsupported")
    val spp = shortOrLong(TagSamplesPerPixel)
    require(spp == 3, s"SamplesPerPixel $spp unsupported (want RGB 3)")
    val rowsPerStrip = shortOrLong(TagRowsPerStrip)
    require(rowsPerStrip >= height, "multi-strip TIFF unsupported")
    // BitsPerSample: 3 shorts, necessarily out of line (6 > 4 bytes)
    val (bTpe, bCnt, bOff) = tags.getOrElse(TagBits,
      throw new IllegalArgumentException("missing BitsPerSample"))
    require(bTpe == 3 && bCnt == 3, s"BitsPerSample type=$bTpe count=$bCnt unsupported")
    require(bOff >= 0 && bOff.toLong + 6 <= payload.length, "BitsPerSample values outside file")
    val bits = (0 until 3).map(k => buf.getShort(bOff + 2 * k) & 0xffff)
    require(bits.forall(_ == 8), s"BitsPerSample $bits unsupported (want 8,8,8)")
    val stripOff = shortOrLong(TagStripOffsets)
    val stripBytes = shortOrLong(TagStripByteCounts)
    // Long product: LONG(4)-typed dims up to Int.MaxValue pass the
    // width>0/height>0 checks, and the Int product can wrap to match
    // a crafted stripBytes — "successful" decode with wrong geometry
    require(stripBytes.toLong == width.toLong * height * 3,
      s"strip bytes $stripBytes != ${width}x$height*3")
    require(stripOff >= 8 && stripOff.toLong + stripBytes <= payload.length,
      s"strip [$stripOff, ${stripOff.toLong + stripBytes}) outside ${payload.length}-byte file")
    TiffMeta(width, height, spp, 8, rowsPerStrip, stripOff, stripBytes)
  }

  /** Pixel PAYLOAD decode: sum the strip's unsigned bytes. TIFF rows
    * are unpadded, so the sum covers exactly width*height*3 bytes —
    * checked against the oracle's cycled-source closed form. */
  def pixelSum(payload: Array[Byte]): Long = {
    val m = decode(payload)
    var sum = 0L
    var i = m.stripOffset
    val end = m.stripOffset + m.stripBytes
    while (i < end) { sum += (payload(i) & 0xff); i += 1 }
    sum
  }
}
