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

  /** Decode the PCM16 sample VALUES out of a RIFF/WAVE container — the
    * same chunk walk as [[decodeWav]], but returning the decoded stream
    * itself (for feature extraction over real decoded units) instead of
    * summary facts. Returns (sampleRate, samples). */
  def wavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          require(le16(bytes, off + 8) == 1, "PCM only")
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          require(bits == 16, s"unsupported bits-per-sample $bits (PCM16 only)")
        case "data" => dataOff = off + 8; dataLen = size
        case _ => // skip unknown chunks
      }
      off += 8 + size + (size & 1)
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = le16(bytes, dataOff + 2 * i).toShort; i += 1 }
    (sampleRate, out)
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

  // ── ISO-BMFF (MP4) container ─────────────────────────────────────────
  //
  // A video pipeline at corpus scale samples KEYFRAMES by demuxing the
  // container — walking the `moov` sample tables to find each sync
  // sample's byte range inside `mdat` — and only then hands those bytes
  // to a codec. The demux half needs no codec at all, so it is
  // implemented for real here: box walking (big-endian size+type),
  // stsz/stsc/stco sample-to-offset resolution, stss sync-sample
  // selection. The muxer writes a minimal valid single-track file
  // (ftyp + mdat + moov{mvhd,trak{tkhd,mdia{mdhd,hdlr,minf{vmhd,dinf,
  // stbl{stsd,stts,stss,stsc,stsz,stco}}}}}) so tests and pipelines can
  // synthesize deterministic containers. moov is written AFTER mdat so
  // chunk offsets don't depend on moov's own size.

  /** Decoded MP4 facts from the sample tables. */
  case class Mp4Info(timescale: Int, durationTicks: Long, nSamples: Int,
                     nSync: Int)

  private def asciiBytes(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def be32Bytes(v: Int): Array[Byte] = {
    val b = new Array[Byte](4); putBe32(b, 0, v); b
  }

  /** Assemble one box: 32-bit big-endian total size + 4-char type +
    * concatenated payload parts. */
  private def mp4Box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val size = 8 + parts.iterator.map(_.length).sum
    val out = new Array[Byte](size)
    putBe32(out, 0, size)
    asciiBytes(typ).copyToArray(out, 4)
    var off = 8
    parts.foreach { p => p.copyToArray(out, off); off += p.length }
    out
  }

  /** FullBox = box whose payload starts with version(8) + flags(24). */
  private def mp4FullBox(typ: String, version: Int, flags: Int,
                         parts: Array[Byte]*): Array[Byte] = {
    val head = new Array[Byte](4)
    head(0) = version.toByte
    head(1) = ((flags >> 16) & 0xff).toByte
    head(2) = ((flags >> 8) & 0xff).toByte
    head(3) = (flags & 0xff).toByte
    mp4Box(typ, (head +: parts): _*)
  }

  /** Serialize frames into a minimal single-track single-chunk MP4.
    * Every `syncEvery`-th frame (1st, 1+syncEvery, …) is marked as a sync
    * sample in `stss`; each frame is one sample of duration 1 tick. */
  def encodeMp4(frames: Array[Array[Byte]], syncEvery: Int,
                timescale: Int = 1000): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(syncEvery >= 1, s"syncEvery must be >= 1, got $syncEvery")
    val n = frames.length
    val ftyp = mp4Box("ftyp", asciiBytes("isom"), be32Bytes(0x200),
      asciiBytes("isomiso2mp41"))
    val mdat = mp4Box("mdat", frames: _*)
    // Single chunk: first sample starts right after mdat's 8-byte header.
    val firstSampleOffset = ftyp.length + 8

    // stsd: one VisualSampleEntry-shaped entry ("mp4v", 86 bytes). The
    // demuxer never decodes sample payloads, so the entry is structural.
    val sampleEntry = {
      val e = new Array[Byte](86)
      putBe32(e, 0, 86); asciiBytes("mp4v").copyToArray(e, 4)
      e(15) = 1.toByte // data_reference_index = 1 (16-bit BE at 14)
      putBe16Be(e, 32, 16); putBe16Be(e, 34, 16) // width, height
      putBe32(e, 36, 0x00480000); putBe32(e, 40, 0x00480000) // 72 dpi
      putBe16Be(e, 48, 1) // frame_count
      e(82) = 0x18 // depth = 24
      e(84) = 0xff.toByte; e(85) = 0xff.toByte // pre_defined = -1
      e
    }
    val stsd = mp4FullBox("stsd", 0, 0, be32Bytes(1), sampleEntry)
    val stts = mp4FullBox("stts", 0, 0, be32Bytes(1), be32Bytes(n),
      be32Bytes(1))
    val syncs = (1 to n by syncEvery).toArray
    val stss = mp4FullBox("stss", 0, 0, be32Bytes(syncs.length),
      joinBe32(syncs))
    val stsc = mp4FullBox("stsc", 0, 0, be32Bytes(1), be32Bytes(1),
      be32Bytes(n), be32Bytes(1))
    val stsz = mp4FullBox("stsz", 0, 0, be32Bytes(0), be32Bytes(n),
      joinBe32(frames.map(_.length)))
    val stco = mp4FullBox("stco", 0, 0, be32Bytes(1),
      be32Bytes(firstSampleOffset))
    val stbl = mp4Box("stbl", stsd, stts, stss, stsc, stsz, stco)

    val url = mp4FullBox("url ", 0, 1) // self-contained
    val dref = mp4FullBox("dref", 0, 0, be32Bytes(1), url)
    val dinf = mp4Box("dinf", dref)
    val vmhd = mp4FullBox("vmhd", 0, 1, new Array[Byte](8))
    val minf = mp4Box("minf", vmhd, dinf, stbl)
    val hdlr = mp4FullBox("hdlr", 0, 0, be32Bytes(0), asciiBytes("vide"),
      new Array[Byte](12), asciiBytes("graft"), new Array[Byte](1))
    val mdhd = mp4FullBox("mdhd", 0, 0, be32Bytes(0), be32Bytes(0),
      be32Bytes(timescale), be32Bytes(n), Array[Byte](0x55, 0xc4.toByte),
      new Array[Byte](2)) // language "und" + pre_defined
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val tkhd = {
      val p = new Array[Byte](80)
      putBe32(p, 8, 1) // track_ID
      putBe32(p, 16, n) // duration
      putBe32(p, 36, 0x00010000); putBe32(p, 52, 0x00010000)
      putBe32(p, 68, 0x40000000) // unity matrix
      mp4FullBox("tkhd", 0, 7, p)
    }
    val trak = mp4Box("trak", tkhd, mdia)
    val mvhd = {
      val p = new Array[Byte](96)
      putBe32(p, 8, timescale)
      putBe32(p, 12, n) // duration
      putBe32(p, 16, 0x00010000) // rate 1.0
      p(20) = 1 // volume 1.0 (8.8 fixed, high byte)
      putBe32(p, 32, 0x00010000); putBe32(p, 48, 0x00010000)
      putBe32(p, 64, 0x40000000) // unity matrix
      putBe32(p, 92, 2) // next_track_ID
      mp4FullBox("mvhd", 0, 0, p)
    }
    val moov = mp4Box("moov", mvhd, trak)

    val out = new Array[Byte](ftyp.length + mdat.length + moov.length)
    ftyp.copyToArray(out, 0)
    mdat.copyToArray(out, ftyp.length)
    moov.copyToArray(out, ftyp.length + mdat.length)
    out
  }

  private def putBe16Be(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 8) & 0xff).toByte; b(off + 1) = (v & 0xff).toByte
  }

  private def joinBe32(vs: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](vs.length * 4)
    var i = 0
    while (i < vs.length) { putBe32(out, i * 4, vs(i)); i += 1 }
    out
  }

  /** Find the first child box of `typ` inside [start, end); returns the
    * payload range. Box sizes are validated against the enclosing range
    * before any use (crafted sizes must not walk out of bounds). */
  private def findBox(b: Array[Byte], start: Int, end: Int,
                      typ: String): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val size = be32(b, off)
      require(size >= 8 && size <= end - off,
        s"bad box size $size at offset $off")
      if (tag(b, off + 4) == typ) return Some((off + 8, off + size))
      off += size
    }
    None
  }

  private def requireBox(b: Array[Byte], start: Int, end: Int,
                         typ: String): (Int, Int) =
    findBox(b, start, end, typ).getOrElse(
      throw new IllegalArgumentException(s"missing $typ box"))

  /** Count declared in a table box, bounds-checked against the bytes that
    * actually follow BEFORE any allocation (crafted-header guard, same
    * policy as the PNG decoder). */
  private def checkedCount(b: Array[Byte], off: Int, end: Int,
                           bytesPer: Int, what: String): Int = {
    require(end - off >= 4, s"$what too short for a count")
    val n = be32(b, off)
    require(n >= 0 && n.toLong * bytesPer <= end - off - 4,
      s"$what count $n exceeds box payload")
    n
  }

  /** Walk the container and resolve every sample's absolute byte range
    * from stsz/stsc/stco, plus the stss sync set and mdhd timing. Returns
    * (info, sizes, absolute offsets, sync flags). A genuine demux: nothing
    * here assumes the single-chunk layout the muxer happens to write. */
  def mp4SampleTable(bytes: Array[Byte])
      : (Mp4Info, Array[Int], Array[Long], Array[Boolean]) = {
    require(bytes.length >= 16, "too short for an MP4")
    val (ftS, _) = requireBox(bytes, 0, bytes.length, "ftyp")
    require(ftS >= 8, "bad ftyp")
    val (moovS, moovE) = requireBox(bytes, 0, bytes.length, "moov")
    val (trakS, trakE) = requireBox(bytes, moovS, moovE, "trak")
    val (mdiaS, mdiaE) = requireBox(bytes, trakS, trakE, "mdia")
    val (mdhdS, mdhdE) = requireBox(bytes, mdiaS, mdiaE, "mdhd")
    require(mdhdE - mdhdS >= 20, "mdhd too short")
    require(bytes(mdhdS) == 0, "only mdhd version 0 supported")
    val timescale = be32(bytes, mdhdS + 12)
    val duration = be32(bytes, mdhdS + 16).toLong & 0xffffffffL
    val (minfS, minfE) = requireBox(bytes, mdiaS, mdiaE, "minf")
    val (stblS, stblE) = requireBox(bytes, minfS, minfE, "stbl")

    // stsz → per-sample sizes
    val (stszS, stszE) = requireBox(bytes, stblS, stblE, "stsz")
    require(stszE - stszS >= 12, "stsz too short")
    val uniform = be32(bytes, stszS + 4)
    val nSamples = be32(bytes, stszS + 8)
    require(nSamples > 0, "no samples")
    val sizes =
      if (uniform != 0) {
        require(uniform > 0 && nSamples.toLong * uniform <= bytes.length,
          s"uniform sample table $nSamples x $uniform exceeds file size")
        Array.fill(nSamples)(uniform)
      } else {
        require(nSamples.toLong * 4 <= stszE - stszS - 12,
          s"stsz count $nSamples exceeds box payload")
        Array.tabulate(nSamples)(i => be32(bytes, stszS + 12 + i * 4))
      }
    sizes.foreach(s => require(s >= 0 && s <= bytes.length,
      s"bad sample size $s"))

    // stsc → samples-per-chunk runs; stco → chunk start offsets
    val (stscS, stscE) = requireBox(bytes, stblS, stblE, "stsc")
    val nRuns = checkedCount(bytes, stscS + 4, stscE, 12, "stsc")
    require(nRuns > 0, "empty stsc")
    val runs = Array.tabulate(nRuns) { i =>
      val o = stscS + 8 + i * 12
      (be32(bytes, o), be32(bytes, o + 4)) // (first_chunk, samples/chunk)
    }
    val (stcoS, stcoE) = requireBox(bytes, stblS, stblE, "stco")
    val nChunks = checkedCount(bytes, stcoS + 4, stcoE, 4, "stco")
    require(nChunks > 0, "empty stco")
    val chunkOffsets = Array.tabulate(nChunks)(i =>
      be32(bytes, stcoS + 8 + i * 4).toLong & 0xffffffffL)

    // Resolve each sample's absolute offset by walking chunks in order.
    val offsets = new Array[Long](nSamples)
    var run = 0
    var sample = 0
    var chunk = 1
    while (chunk <= nChunks && sample < nSamples) {
      while (run + 1 < nRuns && runs(run + 1)._1 <= chunk) run += 1
      val perChunk = runs(run)._2
      require(perChunk > 0, "non-positive samples_per_chunk")
      var off = chunkOffsets(chunk - 1)
      var i = 0
      while (i < perChunk && sample < nSamples) {
        require(off + sizes(sample) <= bytes.length,
          s"sample $sample range [$off, ${off + sizes(sample)}) outside file")
        offsets(sample) = off
        off += sizes(sample)
        sample += 1
        i += 1
      }
      chunk += 1
    }
    require(sample == nSamples,
      s"chunk tables cover $sample of $nSamples samples")

    // stss → sync flags (absent ⇒ every sample is sync, per spec)
    val sync = Array.fill(nSamples)(false)
    findBox(bytes, stblS, stblE, "stss") match {
      case Some((sS, sE)) =>
        val nSync = checkedCount(bytes, sS + 4, sE, 4, "stss")
        var i = 0
        while (i < nSync) {
          val s = be32(bytes, sS + 8 + i * 4)
          require(s >= 1 && s <= nSamples, s"sync sample $s out of range")
          sync(s - 1) = true
          i += 1
        }
      case None => java.util.Arrays.fill(sync, true)
    }
    (Mp4Info(timescale, duration, nSamples, sync.count(identity)),
      sizes, offsets, sync)
  }

  /** Demux the container's SYNC samples (keyframes): the byte payload of
    * every stss-marked sample, extracted from mdat via the resolved
    * offsets. Returns (0-based sample index, payload bytes). */
  def mp4SyncSamples(bytes: Array[Byte]): Vector[(Int, Array[Byte])] = {
    val (_, sizes, offsets, sync) = mp4SampleTable(bytes)
    val out = Vector.newBuilder[(Int, Array[Byte])]
    var i = 0
    while (i < sizes.length) {
      if (sync(i)) {
        val start = offsets(i).toInt
        out += ((i, java.util.Arrays.copyOfRange(bytes, start,
          start + sizes(i))))
      }
      i += 1
    }
    out.result()
  }

  /** Parse header facts only (timing + sample counts). */
  def decodeMp4(bytes: Array[Byte]): Mp4Info = mp4SampleTable(bytes)._1

  // ── GIF (8-bit palette, real LZW) ─────────────────────────────────────

  /** Decoded GIF facts: image-descriptor geometry plus the integer sum of
    * the PALETTE-RESOLVED red channel over all pixels (with the identity
    * grayscale palette the encoder writes, that is the sum of the pixel
    * values themselves) — the decode is palette-aware, not an index
    * pass-through. */
  case class GifInfo(width: Int, height: Int, sumPixels: Long)

  /** Pixel-count guard shared by the GIF paths: rejects crafted headers
    * before any allocation (same discipline as the PNG dimension guards).
    */
  private val GifMaxPixels: Long = 1L << 26

  private def gifFail(msg: String): Nothing =
    throw new IllegalArgumentException(s"not a decodable GIF: $msg")

  /** GIF-variant LZW compression of 8-bit codes (minCodeSize 8): variable
    * code width 9→12 LSB-first, initial clear code, deferred clear when
    * the table fills (spec-sanctioned; decoders must simply stop adding),
    * EOI terminator.
    *
    * WIDTH RULE (the classic desync trap): the width check runs after
    * every EMITTED code, against the table size at emission time — NOT at
    * table-add time. The final data code before EOI is emitted without a
    * following add, while the decoder always adds after reading it; a
    * table-add-driven bump would therefore desync the EOI's width
    * whenever the 2^w boundary lands exactly on the final code. Emission-
    * driven bumping (what giflib does) keeps both sides aligned for every
    * code, including EOI. The decoder mirrors with a read-driven counter.
    */
  private def lzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeWidth = minCodeSize + 1
    var nextCode = eoi + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeWidth
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
      // post-emission width check (see WIDTH RULE above)
      if (nextCode >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    put(clear)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          if (nextCode < 4096) {
            dict.put(key, Integer.valueOf(nextCode)); nextCode += 1
          }
          cur = k
        }
        i += 1
      }
      put(cur)
    }
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decode. The classic table-lag algorithm: the decoder
    * reconstructs each table entry one code AFTER the encoder created it,
    * which is why a code equal to the next free slot is legal (the KwKwK
    * case — the sequence is prev + first(prev)). The code width grows via
    * a READ-driven counter (`runningCode`, giflib's convention), the
    * exact mirror of the encoder's emission-driven rule — see the WIDTH
    * RULE note on lzwEncode; a table-add-driven bump here desyncs on the
    * final code before EOI. `maxBytes` bounds output before any work — a
    * crafted stream cannot decompress-bomb. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        maxBytes: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextCode = eoi + 1
    var runningCode = eoi + 1
    var codeWidth = minCodeSize + 1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    def read(): Int = {
      while (bitCnt < codeWidth) {
        if (pos >= data.length) return -1
        bitBuf |= (data(pos) & 0xffL) << bitCnt; pos += 1; bitCnt += 8
      }
      val c = (bitBuf & ((1L << codeWidth) - 1)).toInt
      bitBuf >>>= codeWidth; bitCnt -= codeWidth
      c
    }
    val stack = new Array[Byte](4097)
    // expand `code` (strictly below nextCode) onto the stack; returns depth
    def expand(code: Int): Int = {
      var sp = 0; var c = code
      while (c >= eoi + 1) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      if (c >= clear) gifFail(s"LZW chain ends in reserved code $c")
      stack(sp) = c.toByte; sp + 1
    }
    def emit(depth: Int): Unit = {
      if (out.size() + depth > maxBytes) gifFail("LZW output exceeds pixel count")
      var sp = depth - 1
      while (sp >= 0) { out.write(stack(sp) & 0xff); sp -= 1 }
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == -1) gifFail("truncated LZW stream (no EOI)")
      // read-driven width counter: advance for every DATA code, before the
      // next read — including the final one before EOI (see docstring)
      if (code != clear && code != eoi) {
        runningCode += 1
        if (runningCode > (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      }
      if (code == clear) {
        nextCode = eoi + 1; runningCode = eoi + 1
        codeWidth = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) gifFail(s"first code after clear is not a literal: $code")
        emit(expand(code))
        prev = code
      } else {
        // code == nextCode is the KwKwK case and requires a free slot; a
        // 12-bit read is ≤ 4095, so at nextCode == 4096 it cannot occur —
        // the only invalid shape is code > nextCode
        if (code > nextCode)
          gifFail(s"LZW code $code beyond table size $nextCode")
        val fb: Byte =
          if (code == nextCode) { // KwKwK: seq(prev) + first byte of seq(prev)
            val depth = expand(prev)
            val f = stack(depth - 1) // first byte sits at the stack bottom
            emit(depth)
            if (out.size() + 1 > maxBytes) gifFail("LZW output exceeds pixel count")
            out.write(f & 0xff)
            f
          } else {
            val depth = expand(code)
            val f = stack(depth - 1)
            emit(depth)
            f
          }
        if (nextCode < 4096) {
          prefix(nextCode) = prev; suffix(nextCode) = fb
          nextCode += 1
        }
        prev = code
      }
    }
    out.toByteArray
  }

  /** Serialize 8-bit row-major pixel indices into a genuine GIF87a: header,
    * logical screen descriptor, 256-entry identity-grayscale global color
    * table, image descriptor, real LZW-compressed table-based image data
    * in ≤255-byte sub-blocks, trailer. */
  def encodeGif(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width * height == pixels.length,
      s"pixel buffer ${pixels.length} != $width x $height")
    require(width <= 0xffff && height <= 0xffff, "GIF geometry is 16-bit")
    val out = new java.io.ByteArrayOutputStream()
    out.write(asciiBytes("GIF87a"))
    val lsd = new Array[Byte](7)
    putLe16(lsd, 0, width); putLe16(lsd, 2, height)
    lsd(4) = 0xf7.toByte // GCT present, 8-bit color resolution, 256 entries
    out.write(lsd)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    val idesc = new Array[Byte](10)
    idesc(0) = 0x2c
    putLe16(idesc, 5, width); putLe16(idesc, 7, height)
    out.write(idesc)
    out.write(8) // LZW minimum code size
    val lzw = lzwEncode(pixels, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)    // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Length-prefixed sub-block walk: returns (concatenated payload, next
    * offset past the 0x00 terminator). */
  private def gifSubBlocks(b: Array[Byte], start: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = start
    var done = false
    while (!done) {
      if (pos >= b.length) gifFail("truncated sub-block chain")
      val n = b(pos) & 0xff; pos += 1
      if (n == 0) done = true
      else {
        if (pos + n > b.length) gifFail("sub-block overruns input")
        out.write(b, pos, n); pos += n
      }
    }
    (out.toByteArray, pos)
  }

  /** Decode the FIRST image of a GIF87a/89a stream — full container walk
    * (header, color tables, extensions skipped sub-block-correctly, image
    * descriptor, LZW data, trailer) with the same reject-before-allocate
    * discipline as the PNG/MP4 decoders. Interlaced images are supported
    * and de-interlaced to top-down row order (the 4-pass GIF scheme —
    * required for `javax.imageio` interop, whose writer interlaces by
    * default). Returns (width, height, palette RGB bytes, pixel index
    * bytes). */
  def gifPixels(bytes: Array[Byte]): (Int, Int, Array[Byte], Array[Byte]) = {
    if (bytes.length < 13) gifFail("shorter than header + screen descriptor")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") gifFail(s"bad signature '$sig'")
    val packed = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > bytes.length) gifFail("truncated global color table")
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
      pos += 3 * n
    }
    var result: (Int, Int, Array[Byte], Array[Byte]) = null
    var done = false
    while (!done) {
      if (pos >= bytes.length) gifFail("missing trailer")
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension block: label byte, then sub-blocks
          if (pos + 2 > bytes.length) gifFail("truncated extension")
          pos = gifSubBlocks(bytes, pos + 2)._2
        case 0x2c =>
          if (pos + 10 > bytes.length) gifFail("truncated image descriptor")
          val iw = le16(bytes, pos + 5); val ih = le16(bytes, pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          if (iw <= 0 || ih <= 0) gifFail(s"degenerate geometry $iw x $ih")
          if (iw.toLong * ih > GifMaxPixels)
            gifFail(s"geometry $iw x $ih exceeds the $GifMaxPixels-pixel guard")
          pos += 10
          var palette = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > bytes.length) gifFail("truncated local color table")
            palette = java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (palette == null) gifFail("image has no color table")
          if (pos >= bytes.length) gifFail("missing LZW minimum code size")
          val minCodeSize = bytes(pos) & 0xff; pos += 1
          if (minCodeSize < 2 || minCodeSize > 11)
            gifFail(s"bad LZW minimum code size $minCodeSize")
          val (lzw, p2) = gifSubBlocks(bytes, pos); pos = p2
          val streamed = lzwDecode(lzw, minCodeSize, iw * ih)
          if (streamed.length != iw * ih)
            gifFail(s"decoded ${streamed.length} pixels for $iw x $ih")
          // interlaced streams carry rows in 4 passes (8/8 offset 0, 8/8
          // offset 4, 4/4 offset 2, 2/2 offset 1) — rearrange to top-down
          // (the JDK's own GIF writer interlaces by default, so this path
          // is load-bearing for interop, and pinned by the spec)
          val pixels =
            if (!interlaced) streamed
            else {
              val order =
                (0 until ih by 8) ++ (4 until ih by 8) ++
                  (2 until ih by 4) ++ (1 until ih by 2)
              val out = new Array[Byte](streamed.length)
              var r = 0
              while (r < ih) {
                System.arraycopy(streamed, r * iw, out, order(r) * iw, iw)
                r += 1
              }
              out
            }
          val nColors = palette.length / 3
          var i = 0
          while (i < pixels.length) {
            if ((pixels(i) & 0xff) >= nColors) gifFail("palette index out of range")
            i += 1
          }
          if (result == null) result = (iw, ih, palette, pixels)
        case b => gifFail(f"unknown block type 0x$b%02x")
      }
    }
    if (result == null) gifFail("no image data before trailer")
    result
  }

  /** Decoded facts of the first image: geometry + palette-resolved red sum
    * (see GifInfo). */
  def decodeGif(bytes: Array[Byte]): GifInfo = {
    val (w, h, palette, pixels) = gifPixels(bytes)
    var sum = 0L
    var i = 0
    while (i < pixels.length) {
      sum += palette(3 * (pixels(i) & 0xff)) & 0xff
      i += 1
    }
    GifInfo(w, h, sum)
  }

  // ─────────────────── H.264/AVC SPS geometry (keyframe metadata tier) ──
  // The bounded slice of H.264 that IS decodable without a zero-dependency
  // JVM codec: the sequence parameter set carried in every AVC config
  // record (ISO 14496-15 `avcC`) encodes the stream geometry in
  // Exp-Golomb-coded macroblock counts plus a cropping window. Parsing it
  // gives real width/height/profile/level for inter-frame video whose
  // PIXELS remain out of scope (Rec. ITU-T H.264 §7.3.2.1.1). The writer
  // and reader are independent implementations (bit-writer vs bit-reader
  // with its own field walk), so a round trip is a genuine differential,
  // and both sides speak real emulation-prevention (00 00 0x → 00 00 03
  // 0x), not a naive bit copy.

  case class AvcInfo(profileIdc: Int, levelIdc: Int, width: Int, height: Int)

  private def avcFail(msg: String): Nothing =
    throw new IllegalArgumentException(s"AVC: $msg")

  /** MSB-first bit writer with unsigned Exp-Golomb (ue) support. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u(v: Int, n: Int): Unit = {
      require(n >= 1 && n <= 31 && v >= 0 && (n == 31 || v < (1 << n)))
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def ue(v: Int): Unit = {
      require(v >= 0)
      val cw = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cw)
      if (len > 1) u(0, len - 1)
      u(cw, len)
    }
    /** rbsp_trailing_bits: stop bit + zero-align, then the byte array. */
    def finishRbsp(): Array[Byte] = {
      u(1, 1)
      if (nBits > 0) { cur <<= (8 - nBits); buf += cur.toByte; cur = 0; nBits = 0 }
      buf.toArray
    }
  }

  /** MSB-first bit reader with ue/se and hard bounds (a truncated or
    * adversarial SPS fails, never loops or over-reads). */
  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      require(n >= 1 && n <= 31)
      if (pos + n > bytes.length * 8) avcFail("SPS truncated")
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 30) avcFail("Exp-Golomb code too long")
      }
      if (zeros == 0) 0 else ((1 << zeros) | u(zeros)) - 1
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Insert emulation-prevention bytes: any 00 00 followed by 00..03
    * becomes 00 00 03 xx (Rec. H.264 §7.4.1.1). */
  private def ebspOf(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    for (b <- rbsp) {
      if (zeros == 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** Strip emulation-prevention bytes (the inverse of [[ebspOf]]). */
  private def rbspOf(ebsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    var i = 0
    while (i < ebsp.length) {
      val b = ebsp(i)
      if (zeros == 2 && b == 3 && i + 1 < ebsp.length &&
          (ebsp(i + 1) & 0xff) <= 3) {
        zeros = 0 // emulation-prevention byte: skip
      } else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  /** Encode a baseline-profile SPS NAL for a frame-coded 4:2:0 stream of
    * the given geometry. Width/height must be positive and EVEN (the
    * 4:2:0 crop unit is 2 pixels); non-multiples of 16 are expressed the
    * way real encoders do it — macroblock-aligned size + cropping window. */
  def encodeAvcSps(width: Int, height: Int,
                   profileIdc: Int = 66, levelIdc: Int = 30): Array[Byte] = {
    if (width <= 0 || height <= 0 || width % 2 != 0 || height % 2 != 0)
      avcFail(s"geometry must be positive and even: ${width}x$height")
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val w = new BitWriter
    w.u(profileIdc, 8) // profile_idc
    w.u(0, 8) // constraint flags + reserved_zero_2bits
    w.u(levelIdc, 8) // level_idc
    w.ue(0) // seq_parameter_set_id
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(0) // pic_order_cnt_type = 0
    w.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1) // max_num_ref_frames
    w.u(0, 1) // gaps_in_frame_num_value_allowed_flag
    w.ue(mbW - 1) // pic_width_in_mbs_minus1
    w.ue(mbH - 1) // pic_height_in_map_units_minus1
    w.u(1, 1) // frame_mbs_only_flag
    w.u(0, 1) // direct_8x8_inference_flag
    val cropR = (mbW * 16 - width) / 2 // crop units of SubWidthC = 2
    val cropB = (mbH * 16 - height) / 2 // frame 4:2:0: SubHeightC = 2
    if (cropR > 0 || cropB > 0) {
      w.u(1, 1) // frame_cropping_flag
      w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
    } else w.u(0, 1)
    w.u(0, 1) // vui_parameters_present_flag
    Array[Byte](0x67.toByte) ++ ebspOf(w.finishRbsp()) // nal_ref_idc=3, type=7
  }

  /** Wrap an SPS NAL in an AVCDecoderConfigurationRecord (`avcC`,
    * ISO 14496-15 §5.2.4.1) — the form geometry metadata actually ships
    * in inside an MP4 `stsd` entry. */
  def encodeAvcc(spsNal: Array[Byte]): Array[Byte] = {
    if (spsNal.length < 4 || (spsNal(0) & 0x1f) != 7) avcFail("not an SPS NAL")
    if (spsNal.length > 0xffff) avcFail("SPS too long")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out += 1 // configurationVersion
    out += spsNal(1) // AVCProfileIndication
    out += spsNal(2) // profile_compatibility
    out += spsNal(3) // AVCLevelIndication
    out += 0xff.toByte // reserved(6)=1s + lengthSizeMinusOne=3
    out += 0xe1.toByte // reserved(3)=1s + numOfSequenceParameterSets=1
    out += ((spsNal.length >> 8) & 0xff).toByte
    out += (spsNal.length & 0xff).toByte
    out ++= spsNal
    out += 0 // numOfPictureParameterSets
    out.toArray
  }

  /** Parse the FIRST SPS of an avcC record and return the stream
    * geometry. Independent of the encoder: its own field walk over the
    * full §7.3.2.1.1 syntax including the high-profile chroma branch and
    * pic_order_cnt_type 1, with hard failures on truncation, scaling
    * lists, and over-long codes. */
  def decodeAvccGeometry(avcc: Array[Byte]): AvcInfo = {
    if (avcc.length < 8) avcFail("avcC truncated")
    if (avcc(0) != 1) avcFail(s"bad configurationVersion ${avcc(0)}")
    if ((avcc(5) & 0x1f) < 1) avcFail("no SPS in avcC")
    val spsLen = ((avcc(6) & 0xff) << 8) | (avcc(7) & 0xff)
    if (spsLen < 4) avcFail("SPS too short")
    if (8 + spsLen > avcc.length) avcFail("SPS length beyond record")
    val nal = java.util.Arrays.copyOfRange(avcc, 8, 8 + spsLen)
    if ((nal(0) & 0x1f) != 7) avcFail("first parameter set is not an SPS")
    val r = new BitReader(rbspOf(java.util.Arrays.copyOfRange(nal, 1, nal.length)))
    val profileIdc = r.u(8)
    r.u(8) // constraint flags + reserved
    val levelIdc = r.u(8)
    r.ue() // seq_parameter_set_id
    var chromaFormatIdc = 1 // default for non-high profiles (4:2:0)
    var separateColourPlane = 0
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profileIdc)) {
      chromaFormatIdc = r.ue()
      if (chromaFormatIdc == 3) separateColourPlane = r.u(1)
      r.ue() // bit_depth_luma_minus8
      r.ue() // bit_depth_chroma_minus8
      r.u(1) // qpprime_y_zero_transform_bypass_flag
      if (r.u(1) == 1) avcFail("seq_scaling_matrix unsupported")
    }
    r.ue() // log2_max_frame_num_minus4
    val pocType = r.ue()
    if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else if (pocType == 1) {
      r.u(1); r.se(); r.se()
      val n = r.ue()
      if (n > 255) avcFail("num_ref_frames_in_pic_order_cnt_cycle too large")
      var i = 0
      while (i < n) { r.se(); i += 1 }
    }
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val mbW = r.ue() + 1
    val mapH = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
    r.u(1) // direct_8x8_inference_flag
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u(1) == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    val chromaArrayType = if (separateColourPlane == 1) 0 else chromaFormatIdc
    val (subW, subH) = chromaArrayType match {
      case 0 => (1, 1) // monochrome / separate planes: luma-sample units
      case 1 => (2, 2) // 4:2:0
      case 2 => (2, 1) // 4:2:2
      case 3 => (1, 1) // 4:4:4
      case c => avcFail(s"bad chroma_format_idc $c")
    }
    val cropX = subW
    val cropY = subH * (2 - frameMbsOnly)
    val width = mbW * 16 - cropX * (cl + cr)
    val height = (2 - frameMbsOnly) * mapH * 16 - cropY * (ct + cb)
    if (width <= 0 || height <= 0) avcFail(s"crop exceeds frame: ${width}x$height")
    AvcInfo(profileIdc, levelIdc, width, height)
  }
}
