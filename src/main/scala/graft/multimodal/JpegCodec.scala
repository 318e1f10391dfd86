package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Real LOSSY JPEG codec on the JDK's built-in `javax.imageio` —
  * retires the image half of [[MultimodalOps.StubCodec]] that
  * [[PngCodec]] left open. Decode reuses [[PngCodec.decode]]
  * (ImageIO reads any supported container); what's new here is the
  * lossy-roundtrip scoring: a lossy codec has no bit-exact invariant,
  * so [[MultimodalOps.mmJpeg]] follows the `agg_approx` pattern —
  * score the roundtrip IN-QUERY against the deterministic source
  * raster and declare within-tolerance FLAGS (DCT quantization error
  * is bounded) plus the exact header metadata, which the oracle
  * recomputes from the generation arithmetic.
  *
  * Sources are GRAYSCALE (r=g=b): constant chroma planes survive
  * 4:2:0 subsampling exactly, so the roundtrip error is pure luma
  * quantization — small and bounded even on noise-like content
  * (cycled text bytes), which full-color noise is not.
  */
object JpegCodec {

  /** Encode a w×h grayscale raster (one byte per pixel, row-major,
    * expanded to r=g=b) as a real JPEG at the given quality. */
  def encode(w: Int, h: Int, gray: Array[Byte], quality: Float = 0.9f): Array[Byte] = {
    require(gray.length == w * h, s"need ${w * h} bytes, got ${gray.length}")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = gray(i) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        i += 1; x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode JPEG bytes back to a raster (same ImageIO entry point as
    * [[PngCodec.decode]]). */
  def decode(jpeg: Array[Byte]): BufferedImage = PngCodec.decode(jpeg)

  /** Roundtrip error statistics of a decoded raster against the
    * grayscale source: (mean abs error per component, peak abs error,
    * abs mean-luma drift). All three are bounded for any correct JPEG
    * implementation at fixed quality — the declarable invariants. */
  def errorStats(gray: Array[Byte], img: BufferedImage): (Double, Int, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    var sumAbs = 0L
    var peak = 0
    var sumSrc = 0L
    var sumDec = 0L
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = gray(i) & 0xff
        val p = img.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val dec = (p >> (8 * c)) & 0xff
          val d = math.abs(dec - src)
          sumAbs += d
          if (d > peak) peak = d
          sumDec += dec
          c += 1
        }
        sumSrc += 3L * src
        i += 1; x += 1
      }
      y += 1
    }
    val n = 3L * w * h
    (sumAbs.toDouble / n, peak, math.abs(sumDec - sumSrc).toDouble / n)
  }
}
