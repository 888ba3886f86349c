package graft.ext

/** Pure-JVM media container codecs — the REAL decode half of the
  * multimodal pipeline (SURVEY §2.9 X8). This container ships no external
  * codec libraries, so the formats implemented are the ones the JDK alone
  * can decode honestly: RIFF/WAVE PCM16 audio, 24-bit uncompressed BMP,
  * and 8-bit non-interlaced PNG (zlib/DEFLATE via `java.util.zip.Inflater`
  * plus the five scanline filters). All decoders are genuine parsers —
  * chunk walking, endian field decoding, CRC verification, padded/filtered
  * pixel rows — not format-shaped stubs; the encoders exist so pipelines
  * (and tests) can synthesize valid containers deterministically.
  *
  * Everything here is plain byte arithmetic on a local array — the
  * distributed story is Media.decodeWav/decodeBmp/decodePng, which run
  * these per partition over the binary column (decoder state initialized
  * once per partition, amortized across its rows).
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

  // ── PNG (8-bit grayscale/RGB/RGBA, non-interlaced) ────────────────────

  /** Decoded PNG facts: IHDR geometry plus the integer sum of all decoded
    * channel bytes (after unfiltering — values of the actual image, not of
    * the compressed stream). */
  case class PngInfo(width: Int, height: Int, bitDepth: Int, channels: Int,
                     sumChannels: Long)

  private val pngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte; b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }

  /** One PNG chunk: length, type, data, CRC32 over type+data. */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putBe32(out, 0, data.length)
    typ.getBytes("US-ASCII").copyToArray(out, 4)
    data.copyToArray(out, 8)
    val crc = new java.util.zip.CRC32()
    crc.update(out, 4, 4 + data.length)
    putBe32(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  /** Paeth predictor (PNG filter 4): the neighbor — left a, above b,
    * upper-left c — closest to a + b − c, ties resolved a, b, c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 6 => 4 // RGBA
    case t => throw new IllegalArgumentException(
      s"unsupported PNG color type $t (grayscale/RGB/RGBA only)")
  }

  /** Serialize 8-bit top-down row-major channel bytes (1 = grayscale,
    * 3 = RGB, 4 = RGBA) into a genuine PNG: signature, IHDR, one IDAT
    * holding the zlib-deflated filtered scanlines, IEND — CRCs included.
    * `filterType` picks the per-scanline filter (0–4); 0 (None) is the
    * deterministic default, the others exist so the decoder's filter
    * reconstruction is testable against real filtered streams. */
  def encodePng(width: Int, height: Int, channels: Int,
                channelBytes: Array[Byte], filterType: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(channels == 1 || channels == 3 || channels == 4,
      s"unsupported channel count $channels")
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    require(channelBytes.length == width * height * channels,
      "channelBytes must be width * height * channels")
    val stride = width * channels
    // Filtered scanlines: each row is a filter-type byte + stride bytes of
    // raw(x) − predictor(x) mod 256.
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = channelBytes(y * stride + x) & 0xff
        val left = if (x >= channels) channelBytes(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) channelBytes((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= channels && y > 0)
          channelBytes((y - 1) * stride + x - channels) & 0xff else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    val idat = try {
      deflater.setInput(raw)
      deflater.finish()
      val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
      buf.toByteArray
    } finally deflater.end()
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width)
    putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (channels match { case 1 => 0; case 3 => 2; case 4 => 6 }).toByte
    // ihdr(10..12): compression 0, filter method 0, non-interlaced
    pngSignature ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", idat) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Parse a PNG and recover the top-down channel-byte stream: validates
    * the signature, walks chunks verifying every CRC, reads geometry from
    * IHDR (8-bit grayscale/RGB/RGBA, non-interlaced only), concatenates
    * the IDAT payloads, inflates the zlib stream, and reconstructs pixels
    * through the five scanline filters (None/Sub/Up/Average/Paeth).
    * Returns (width, height, channels, channelBytes). */
  def pngChannels(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 8 + 25 && // signature + IHDR chunk + room for IEND
      java.util.Arrays.equals(java.util.Arrays.copyOf(bytes, 8), pngSignature),
      "not a PNG")
    var off = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    val crc = new java.util.zip.CRC32()
    while (!sawEnd) {
      require(off + 8 <= bytes.length, "truncated chunk header")
      val len = be32(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length, "truncated chunk")
      val typ = tag(bytes, off + 4)
      crc.reset()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, off + 8 + len),
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          width = be32(bytes, off + 8)
          height = be32(bytes, off + 12)
          require(width > 0 && height > 0, "empty PNG")
          require(bytes(off + 16) == 8,
            s"unsupported bit depth ${bytes(off + 16)} (8 only)")
          channels = channelsOf(bytes(off + 17) & 0xff)
          require(bytes(off + 18) == 0 && bytes(off + 19) == 0,
            "unsupported compression/filter method")
          require(bytes(off + 20) == 0, "interlaced PNG unsupported")
        case "IDAT" =>
          require(width > 0, "IDAT before IHDR")
          idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunks (tEXt, pHYs, …) — skip, CRC-checked
      }
      off += 12 + len
    }
    require(width > 0 && idat.size > 0, "missing IHDR or IDAT")
    // dimensions come from the file (CRC only guards corruption, not a
    // crafted header): a width*height*channels that overflows Int must be
    // a clean rejection, not a negative-size allocation or a silent
    // wraparound decode
    val strideL = width.toLong * channels
    val rawLenL = (strideL + 1) * height
    require(rawLenL <= Int.MaxValue - 16,
      s"PNG dimensions ${width}x$height too large to decode")
    val stride = strideL.toInt
    val rawLen = rawLenL.toInt
    val raw = new Array[Byte](rawLen)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inflater.finished()) {
        val n = inflater.inflate(raw, got, rawLen - got)
        require(n > 0 || inflater.finished(),
          "truncated or dictionary-bearing zlib stream")
        got += n
      }
      require(got == rawLen, s"inflated $got bytes, expected $rawLen")
    } finally inflater.end()
    // Unfilter: each scanline declares its own filter; reconstruction uses
    // the already-reconstructed left/up/upper-left neighbors.
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xff
      require(f <= 4, s"bad scanline filter $f")
      var x = 0
      while (x < stride) {
        val v = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= channels) out(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) out((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= channels && y > 0)
          out((y - 1) * stride + x - channels) & 0xff else 0
        val rec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
        }
        out(y * stride + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (width, height, channels, out)
  }

  /** Parse a PNG into header facts + the channel-byte sum of the DECODED
    * image (full inflate + unfilter — the sum proves the pixels, not the
    * container, survived the round trip). */
  def decodePng(bytes: Array[Byte]): PngInfo = {
    val (w, h, ch, px) = pngChannels(bytes)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += px(i) & 0xff; i += 1 }
    PngInfo(w, h, 8, ch, sum)
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
