package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real PNG codec on the JDK's built-in `javax.imageio` — a genuinely
  * COMPRESSED format (zlib/deflate over filtered scanlines) with zero
  * new dependencies, retiring the image half of
  * [[MultimodalOps.StubCodec]]. PNG is lossless, so a pixel statistic
  * computed after the encode→decode roundtrip equals the same
  * statistic on the source pixels — which is what makes [[MultimodalOps.mmPng]]
  * oracle-checkable even though the compressed byte stream itself is
  * encoder-dependent (the one thing the oracle deliberately does NOT
  * assert).
  *
  * Headless-safe: `BufferedImage`/`ImageIO`/`Graphics2D` raster work
  * needs no display. One codec object per executor JVM, used from
  * `mapPartitions` like the other codecs.
  */
object PngCodec {

  /** Encode w×h packed RGB triplets (row-major, 3 bytes per pixel) as
    * a real PNG. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        i += 3; x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode PNG bytes (any ImageIO-supported format, in fact) back to
    * a raster. */
  def decode(png: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(png))

  /** Sum of every R+G+B component (each 0..255) — the payload-decode
    * evidence: equals the sum of the source triplet bytes iff the
    * compressed roundtrip is faithful. */
  def pixelSum(img: BufferedImage): Long = {
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    s
  }

  /** Real bilinear downscale to fit maxSide — the thumbnailing step a
    * training-data image pipeline runs. Dim arithmetic (trunc after a
    * double multiply) deliberately matches the BMP resize-plan oracle
    * pattern. */
  def resize(img: BufferedImage, maxSide: Int): BufferedImage = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
    val rw = math.max(1, (img.getWidth * scale).toInt)
    val rh = math.max(1, (img.getHeight * scale).toInt)
    val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, rw, rh, null)
    } finally g.dispose()
    out
  }
}
