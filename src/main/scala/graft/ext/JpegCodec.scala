package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** REAL JPEG encode/decode via the JDK's own codec (`javax.imageio`,
  * part of Java SE — zero external dependencies, same policy as the
  * Inflater-backed PNG tier). JPEG is the one image tier that is LOSSY,
  * so round trips are verified by a bounded reconstruction error over
  * the decoded pixels rather than an exact channel sum: a broken decoder
  * (wrong geometry, zeroed or shuffled pixels) blows the bound, while
  * the genuine DCT-quantization error of the grayscale baseline codec
  * stays far inside it.
  *
  * All streams are memory-only (`ImageIO.setUseCache(false)`) so decode
  * on an executor never touches local disk. Reader/writer instances are
  * not thread-safe and are created per call; Spark tasks don't share
  * them across threads.
  */
object JpegCodec {

  // Executor-safe one-time init: no display, no disk-backed image cache.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  // ImageIO writer/reader instances are not thread-safe but ARE reusable
  // across calls (setOutput/setInput resets them). A per-row
  // `getImageWritersByFormatName` walks the service registry every call —
  // per-task-thread caching amortizes that to once per executor thread,
  // the decode-stage equivalent of initializing a codec handle once per
  // partition.
  private val writerTl =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      ImageIO.getImageWritersByFormatName("jpg").next())

  /** Encode an 8-bit grayscale image (row-major `width*height` bytes) as
    * baseline JPEG at the given quality. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
                 quality: Float = 0.9f): Array[Byte] = {
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    require(gray.length == width * height,
      s"expected ${width * height} pixels, got ${gray.length}")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    val writer = writerTl.get()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally {
      writer.setOutput(null) // detach so the cached writer holds no stream
      ios.close()
    }
    bos.toByteArray
  }

  private val readerTl =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      ImageIO.getImageReadersByFormatName("jpg").next())

  /** Decode a JPEG into (width, height, row-major grayscale bytes). A
    * color input is luminance-converted by the raster copy. Undecodable
    * bytes reject cleanly with IllegalArgumentException. */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val reader = readerTl.get()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val img =
      try {
        reader.setInput(iis, true, true)
        reader.read(0)
      } catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"not a decodable JPEG: $e")
      } finally {
        reader.setInput(null)
        iis.close()
      }
    require(img != null, "not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val gray =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val gr = g.createGraphics()
        try gr.drawImage(img, 0, 0, null) finally gr.dispose()
        g
      }
    val out = new Array[Byte](w * h)
    gray.getRaster.getDataElements(0, 0, w, h, out)
    (w, h, out)
  }

  /** Mean absolute per-pixel error between two equal-length pixel
    * arrays — the lossy-round-trip verification metric. */
  def meanAbsError(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length && a.nonEmpty, "length mismatch")
    var err = 0L
    var i = 0
    while (i < a.length) {
      err += math.abs((a(i) & 0xff) - (b(i) & 0xff))
      i += 1
    }
    err.toDouble / a.length
  }
}
