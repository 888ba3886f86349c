package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.9): image/audio/video travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * run per-partition in batches (the JVM analog of `mapInPandas` — one
  * decoder init per partition, amortized over its rows).
  *
  * Decode tiers, all zero-external-dependency:
  *  - Lossless containers the JVM parses byte-for-byte — RIFF/WAVE PCM16,
  *    24-bit BMP, 8-bit PNG (zlib inflate + scanline unfiltering) — are
  *    decoded FOR REAL via MediaCodecs (wavRoundTrip / bmpRoundTrip /
  *    pngRoundTrip, oracle-verified by exact channel sums).
  *  - Lossy JPEG is decoded FOR REAL via the JDK's own `javax.imageio`
  *    codec (`JpegCodec`, headless + memory-only), verified by decoded
  *    geometry plus a bounded reconstruction error (`jpegRoundTrip`).
  *  - Video is demuxed FOR REAL at the container level: `mp4FrameSample`
  *    muxes/demuxes genuine ISO-BMFF, resolving keyframe byte ranges from
  *    the stsz/stsc/stco/stss sample tables (`MediaCodecs.encodeMp4` /
  *    `mp4SyncSamples`) — the 100 TB keyframe-sampling shape.
  *  - Compressed-video PIXEL decode is REAL for intra-frame video:
  *    [[mjpegVideoDecode]] muxes genuine JPEG frames into a genuine MP4
  *    and decodes pixels per demuxed keyframe (MJPEG-in-MP4 — the
  *    pipeline composed entirely of codecs the engine owns). Only
  *    INTER-frame codecs (H.264 P/B-frames and friends) remain outside a
  *    zero-dependency JVM — the narrowed ecosystem limit. Feature
  *    extraction ([[decodeFeatures]]) runs over genuinely decoded units,
  *    and frame sampling ([[mp4FramePayloads]]) reads keyframe bytes back
  *    out of a real container demux.
  * The Spark-side plumbing — binary schema, partition-batched execution,
  * feature schema — is identical across tiers and oracle-tested.
  */
object Media {

  /** REAL per-format feature extraction — the mapInPandas-shaped decode
    * stage computed over genuinely DECODED units, not raw payload bytes.
    * Each document synthesizes the container its dispatch tag names
    * (doc_id mod 5 → WAV / BMP / PNG / JPEG / GIF, the [[dispatchDecode]]
    * routing), decodes it back through the matching REAL parser, and
    * emits features of the decoded stream itself:
    *   - `n_units`   — decoded sample / channel-byte / pixel count
    *     (including the encoder's zero padding — it travels through the
    *     container and comes back out of the decode)
    *   - `head_unit` — the first decoded unit's value (PCM sample for
    *     audio, channel byte for BMP/PNG, palette-RESOLVED pixel for GIF;
    *     −1 for the lossy JPEG tier, whose per-pixel values aren't exact)
    *   - `checksum`  — floorMod(sum of decoded units, 997); for JPEG the
    *     bounded-reconstruction-error verdict (1/0), the lossy tier's
    *     verification value throughout this file.
    * One per-partition pass; decoder dispatch per row, decoder state per
    * partition — the heterogeneous-media decode stage at corpus scale.
    */
  def decodeFeatures(docs: DataFrame, idCol: String, textCol: String,
                     width: Int = 16)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        def feats(units: Iterator[Int]): (Long, Long, Long) = {
          var n = 0L; var head = 0L; var sum = 0L
          units.foreach { v =>
            if (n == 0) head = v.toLong
            sum += v; n += 1
          }
          (n, head, java.lang.Math.floorMod(sum, 997L))
        }
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          java.lang.Math.floorMod(id, 5L).toInt match {
            case 0 =>
              val samples = Array.tabulate(bytes.length)(i =>
                (((bytes(i) & 0xff) - 128) * 256).toShort)
              val (_, dec) = MediaCodecs.wavSamples(
                MediaCodecs.encodeWavPcm16(samples, 8000))
              val (n, head, ck) = feats(dec.iterator.map(_.toInt))
              (id, "wav", n, head, ck)
            case 1 =>
              val rowBytes = width * 3
              val h = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
              val (_, _, dec) = MediaCodecs.bmpChannels(MediaCodecs.encodeBmp24(
                width, h, java.util.Arrays.copyOf(bytes, rowBytes * h)))
              val (n, head, ck) = feats(dec.iterator.map(_ & 0xff))
              (id, "bmp", n, head, ck)
            case 2 =>
              val rowBytes = width * 3
              val h = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
              val (_, _, _, dec) = MediaCodecs.pngChannels(MediaCodecs.encodePng(
                width, h, 3, java.util.Arrays.copyOf(bytes, rowBytes * h)))
              val (n, head, ck) = feats(dec.iterator.map(_ & 0xff))
              (id, "png", n, head, ck)
            case 3 =>
              val h = math.max(1, (bytes.length + width - 1) / width)
              val gray = java.util.Arrays.copyOf(bytes, width * h)
              val (dw, dh, decoded) =
                JpegCodec.decodeGray(JpegCodec.encodeGray(width, h, gray))
              val ok = dw == width && dh == h &&
                JpegCodec.meanAbsError(gray, decoded) <= 32.0
              (id, "jpeg", dw.toLong * dh, -1L, if (ok) 1L else 0L)
            case _ =>
              val h = math.max(1, (bytes.length + width - 1) / width)
              val (_, _, palette, pixels) = MediaCodecs.gifPixels(
                MediaCodecs.encodeGif(width, h,
                  java.util.Arrays.copyOf(bytes, width * h)))
              val (n, head, ck) = feats(
                pixels.iterator.map(p => palette(3 * (p & 0xff)) & 0xff))
              (id, "gif", n, head, ck)
          }
        }
      }
      .toDF("doc_id", "format", "n_units", "head_unit", "checksum")
  }

  /** Synthesize a genuine RIFF/WAVE PCM16 container per document (samples
    * derived from the text bytes), then REALLY parse it back with
    * MediaCodecs.decodeWav — chunk walk, little-endian fields, PCM energy.
    * Every emitted column travels THROUGH the binary container: the decoder
    * reads them out of the bytes, not out of the inputs. Runs per partition
    * (encoder/decoder state is plain byte arithmetic; a real codec handle
    * would be initialized once per partition in the same place).
    */
  def wavRoundTrip(docs: DataFrame, idCol: String, textCol: String,
                   sampleRate: Int = 8000)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val samples = Array.tabulate(bytes.length)(i =>
            (((bytes(i) & 0xff) - 128) * 256).toShort)
          val wav = MediaCodecs.encodeWavPcm16(samples, sampleRate)
          val info = MediaCodecs.decodeWav(wav)
          (id, info.sampleRate.toLong, info.nFrames, info.durationMs, info.energy)
        }
      }
      .toDF("doc_id", "sample_rate", "n_frames", "duration_ms", "energy")
  }

  /** X8b — pixel-intensity histogram over REAL decoded pixels: encode
    * each document as a 24-bit BMP, decode it back through the full
    * container parse (MediaCodecs.bmpChannels — header validation,
    * bottom-up padded-row inversion), then bucket every decoded channel
    * byte into `buckets` equal-width intensity bins. The image-side
    * dedup/quality signal (black-frame detection, exposure profile,
    * near-dup prefilter) — computed from the DECODED stream, so the
    * whole codec path is under the oracle. Zero-padding lands in bucket
    * 0 by construction (the oracle accounts for it explicitly). Only
    * non-empty buckets emit. mapPartitions is confined to the codec,
    * like every media tier; output ≤ buckets rows per doc.
    */
  def bmpHistogram(docs: DataFrame, idCol: String, textCol: String,
                   width: Int = 16, buckets: Int = 16)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val rowBytes = width * 3
          val height = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
          val channels = java.util.Arrays.copyOf(bytes, rowBytes * height)
          val bmp = MediaCodecs.encodeBmp24(width, height, channels)
          val (_, _, dec) = MediaCodecs.bmpChannels(bmp)
          val hist = new Array[Long](buckets)
          dec.foreach(b => hist((b & 0xff) * buckets / 256) += 1)
          hist.zipWithIndex.collect {
            case (n, bk) if n > 0 => (id, bk.toLong, n)
          }
        }
      }
      .toDF("doc_id", "bucket", "n")
  }

  /** Synthesize a genuine 24-bit BMP per document (fixed width; channel
    * bytes = text bytes zero-padded to full rows), then REALLY parse it
    * back with MediaCodecs.decodeBmp — header validation, bottom-up padded
    * rows, channel sum. Geometry columns come from the decoded header. */
  def bmpRoundTrip(docs: DataFrame, idCol: String, textCol: String,
                   width: Int = 16)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val rowBytes = width * 3
          val height = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
          val channels = java.util.Arrays.copyOf(bytes, rowBytes * height)
          val bmp = MediaCodecs.encodeBmp24(width, height, channels)
          val info = MediaCodecs.decodeBmp(bmp)
          (id, info.width.toLong, info.height.toLong,
            info.bitsPerPixel.toLong, info.sumChannels)
        }
      }
      .toDF("doc_id", "width", "height", "bpp", "sum_channels")
  }

  /** Synthesize a genuine 8-bit RGB PNG per document (fixed width; channel
    * bytes = text bytes zero-padded to full rows), then REALLY parse it
    * back with MediaCodecs.decodePng — CRC-verified chunk walk, zlib
    * inflate, scanline unfiltering, channel sum over the DECODED pixels.
    * The compressed tier's analog of bmpRoundTrip: every emitted column
    * travels through the DEFLATE stream inside the container. */
  def pngRoundTrip(docs: DataFrame, idCol: String, textCol: String,
                   width: Int = 16)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val rowBytes = width * 3
          val height = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
          val channels = java.util.Arrays.copyOf(bytes, rowBytes * height)
          val png = MediaCodecs.encodePng(width, height, 3, channels)
          val info = MediaCodecs.decodePng(png)
          (id, info.width.toLong, info.height.toLong,
            info.channels.toLong, info.sumChannels)
        }
      }
      .toDF("doc_id", "width", "height", "channels", "sum_channels")
  }

  /** REAL palette-image round trip: synthesize a genuine GIF87a per
    * document (pixel indices = text bytes zero-padded to full rows, an
    * identity grayscale palette), LZW-compress it with the real GIF
    * algorithm (variable 9→12-bit codes, sub-block framing), then decode
    * it back — LZW table reconstruction, palette resolution — and emit
    * the decoded geometry plus the palette-resolved pixel sum. Every
    * emitted column travels through the compressed container. */
  def gifRoundTrip(docs: DataFrame, idCol: String, textCol: String,
                   width: Int = 16)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val height = math.max(1, (bytes.length + width - 1) / width)
          val pixels = java.util.Arrays.copyOf(bytes, width * height)
          val gif = MediaCodecs.encodeGif(width, height, pixels)
          val info = MediaCodecs.decodeGif(gif)
          (id, info.width.toLong, info.height.toLong, info.sumPixels)
        }
      }
      .toDF("doc_id", "width", "height", "sum_pixels")
  }

  /** REAL image resize for the codec-free tier: synthesize a genuine
    * 24-bit BMP per document (as bmpRoundTrip), nearest-neighbor
    * downsample it by `factor` with MediaCodecs.resizeBmp24 (a real
    * decode → pixel-select → re-encode), then parse the RESIZED container
    * back. Every emitted column travels through BOTH encoded containers —
    * geometry and channel sum come from the resized file's own bytes.
    */
  def bmpResize(docs: DataFrame, idCol: String, textCol: String,
                width: Int = 16, factor: Int = 2)
               (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val rowBytes = width * 3
          val height = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
          val channels = java.util.Arrays.copyOf(bytes, rowBytes * height)
          val bmp = MediaCodecs.encodeBmp24(width, height, channels)
          val resized = MediaCodecs.resizeBmp24(bmp, factor)
          val info = MediaCodecs.decodeBmp(resized)
          (id, info.width.toLong, info.height.toLong,
            info.bitsPerPixel.toLong, info.sumChannels)
        }
      }
      .toDF("doc_id", "width", "height", "bpp", "sum_channels")
  }

  /** REAL lossy-image round trip: synthesize an 8-bit grayscale image per
    * document (pixels = text bytes zero-padded to full rows), encode it as
    * baseline JPEG with the JDK's own codec, decode it back, and verify
    * the reconstruction within a bounded mean absolute pixel error.
    * Geometry columns come from the DECODED header; `lossy_ok` is the
    * lossy tier's analog of the lossless tiers' exact channel sum — a
    * decoder that returns wrong geometry, zeroed, or shuffled pixels
    * blows the bound (ASCII text averages ~90/pixel, so a zeroed decode
    * scores a mean error near 90 against the bound of 32), while genuine
    * DCT quantization error at quality 0.9 stays in single digits.
    */
  def jpegRoundTrip(docs: DataFrame, idCol: String, textCol: String,
                    width: Int = 16, errBound: Double = 32.0)
                   (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val height = math.max(1, (bytes.length + width - 1) / width)
          val gray = java.util.Arrays.copyOf(bytes, width * height)
          val jpeg = JpegCodec.encodeGray(width, height, gray)
          val (w, h, decoded) = JpegCodec.decodeGray(jpeg)
          val ok = w == width && h == height &&
            JpegCodec.meanAbsError(gray, decoded) <= errBound
          (id, w.toLong, h.toLong, ok)
        }
      }
      .toDF("doc_id", "width", "height", "lossy_ok")
  }

  /** REAL video-container frame sampling: split the text bytes into
    * fixed-size frames, mux them into a genuine single-track ISO-BMFF
    * (MP4) container with every `stride`-th frame marked as a sync sample
    * (keyframe), then DEMUX the container — box walk, stsz/stsc/stco
    * sample-offset resolution, stss sync selection — and emit only the
    * keyframes' payloads, read back out of `mdat`. This is exactly what a
    * 100 TB video pipeline does before any codec runs: keyframe byte
    * ranges come from the container's sample tables, so the expensive
    * pixel decode (the remaining JPEG/H.264-shaped stub slot) touches
    * only the sampled frames.
    */
  def mp4FrameSample(docs: DataFrame, idCol: String, textCol: String,
                     frameBytes: Int = 48, stride: Int = 2)
                    (implicit spark: SparkSession): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          if (bytes.isEmpty) Iterator.empty
          else {
            val n = bytes.length
            val nFrames = (n + frameBytes - 1) / frameBytes
            val frames = Array.tabulate(nFrames) { j =>
              java.util.Arrays.copyOfRange(bytes, j * frameBytes,
                math.min(n, (j + 1) * frameBytes))
            }
            val mp4 = MediaCodecs.encodeMp4(frames, syncEvery = stride)
            MediaCodecs.mp4SyncSamples(mp4).iterator.map {
              case (idx, frame) =>
                var s = 0L
                var i = 0
                while (i < frame.length) { s += frame(i) & 0xff; i += 1 }
                (id, idx.toLong, frame.length.toLong, s)
            }
          }
        }
      }
      .toDF("doc_id", "frame_no", "frame_len", "frame_sum")
  }

  /** REAL frame sampling with PAYLOADS: mux the document's fixed-size
    * frames into a genuine ISO-BMFF container ([[mp4FrameSample]]'s
    * pipeline), demux the keyframes via the stsz/stsc/stco/stss sample
    * tables, and emit each keyframe's BYTES as read back out of `mdat` —
    * the row shape the downstream pixel decoder consumes. Empty payloads
    * produce no container and no rows. */
  def mp4FramePayloads(docs: DataFrame, idCol: String, textCol: String,
                       frameBytes: Int = 64, stride: Int = 2)
                      (implicit spark: SparkSession): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          if (bytes.isEmpty) Iterator.empty
          else {
            val n = bytes.length
            val nFrames = (n + frameBytes - 1) / frameBytes
            val frames = Array.tabulate(nFrames) { j =>
              java.util.Arrays.copyOfRange(bytes, j * frameBytes,
                math.min(n, (j + 1) * frameBytes))
            }
            val mp4 = MediaCodecs.encodeMp4(frames, syncEvery = stride)
            MediaCodecs.mp4SyncSamples(mp4).iterator.map {
              case (idx, frame) => (id, idx.toLong, frame)
            }
          }
        }
      }
      .toDF("doc_id", "frame_no", "frame")
  }

  /** REAL pixel-true VIDEO decode — an MJPEG-in-MP4 pipeline built
    * entirely from codecs the engine already owns: each document's bytes
    * become a sequence of `frameBytes`-pixel grayscale frames, every
    * frame is REALLY encoded as baseline JPEG ([[JpegCodec.encodeGray]],
    * the same JDK codec oracle-verified by q_media_jpeg), the JPEG
    * payloads are REALLY muxed into a single-track ISO-BMFF container
    * ([[MediaCodecs.encodeMp4]], oracle-verified by q_media_mp4), and the
    * read side then does what a 100 TB video pipeline does: demux the
    * keyframe byte ranges from the stsz/stsc/stco/stss sample tables and
    * run the EXPENSIVE pixel decode only on those sampled keyframes —
    * every decoded pixel travels the full container+codec path.
    *
    * Output per (doc, keyframe): decoded geometry from the JPEG header,
    * decoded pixel count, and `lossy_ok` — the bounded mean-absolute-
    * reconstruction-error verdict against the pre-encode frame
    * (q_media_jpeg's verification contract: a zeroed/shuffled/cropped
    * decode blows the bound, genuine DCT quantization error does not).
    *
    * This retires the former "compressed-video pixel decode has no JVM
    * codec" stub for INTRA-frame video: only inter-frame codecs (H.264
    * P/B-frames and friends) remain outside a zero-dependency JVM.
    */
  def mjpegVideoDecode(docs: DataFrame, idCol: String, textCol: String,
                       width: Int = 16, frameBytes: Int = 64,
                       stride: Int = 2, errBound: Double = 32.0)
                      (implicit spark: SparkSession): DataFrame = {
    require(width > 0 && frameBytes % width == 0 && stride > 0,
      s"frameBytes=$frameBytes must be a multiple of width=$width")
    import spark.implicits._
    val height = frameBytes / width
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          if (bytes.isEmpty) Iterator.empty
          else {
            val n = bytes.length
            val nFrames = (n + frameBytes - 1) / frameBytes
            // pre-encode gray frames (zero-padded to full geometry) kept
            // for the reconstruction-error verdict
            val grays = Array.tabulate(nFrames) { j =>
              val f = new Array[Byte](frameBytes)
              val len = math.min(frameBytes, n - j * frameBytes)
              System.arraycopy(bytes, j * frameBytes, f, 0, len)
              f
            }
            val jpegs = grays.map(JpegCodec.encodeGray(width, height, _))
            val mp4 = MediaCodecs.encodeMp4(jpegs, syncEvery = stride)
            MediaCodecs.mp4SyncSamples(mp4).iterator.map {
              case (idx, payload) =>
                val (dw, dh, decoded) = JpegCodec.decodeGray(payload)
                val ok = dw == width && dh == height &&
                  JpegCodec.meanAbsError(grays(idx), decoded) <= errBound
                (id, idx.toLong, dw.toLong, dh.toLong, decoded.length.toLong,
                  if (ok) 1L else 0L)
            }
          }
        }
      }
      .toDF("doc_id", "frame_no", "width", "height", "n_pixels", "lossy_ok")
  }

  /** H.264/AVC GEOMETRY tier — the bounded metadata slice of inter-frame
    * video that IS parseable without a codec: per document, a baseline
    * SPS NAL is synthesized for a doc-derived geometry (even, mostly
    * non-multiple-of-16 → the macroblock-align + crop-window path real
    * encoders emit), wrapped in a real `avcC` record, and parsed back by
    * the INDEPENDENT Exp-Golomb field walk ([[MediaCodecs
    * .decodeAvccGeometry]]) — emulation-prevention bytes inserted and
    * stripped for real on both sides. The decoded profile/level/width/
    * height are the output columns, so any disagreement between the bit
    * writer and the bit reader (crop arithmetic, golomb coding,
    * alignment) hash-diverges against the oracle's arithmetic
    * recomputation. PIXEL decode of P/B-frames stays out of scope
    * (no zero-dependency JVM codec); this tier is what a 100 TB video
    * pipeline runs on every asset anyway — geometry triage before the
    * expensive decode is scheduled. */
  def avcGeometry(docs: DataFrame, idCol: String)
                 (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("value"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 2 * (80 + java.lang.Math.floorMod(id, 131L).toInt)
          val h = 2 * (45 + java.lang.Math.floorMod(id, 97L).toInt)
          val avcc = MediaCodecs.encodeAvcc(MediaCodecs.encodeAvcSps(w, h))
          val info = MediaCodecs.decodeAvccGeometry(avcc)
          (id, info.profileIdc.toLong, info.levelIdc.toLong,
            info.width.toLong, info.height.toLong)
        }
      }
      .toDF("doc_id", "profile_idc", "level_idc", "width", "height")
  }

  /** Mixed-format decode DISPATCH — the multimodal column as it actually
    * appears at corpus scale: one opaque binary column whose rows carry
    * different formats, routed to the right decoder by a format tag.
    * Each document synthesizes the container its tag names (WAV, BMP,
    * PNG, JPEG, or GIF — all five REAL per-row codecs) and decodes it
    * back through the matching parser, inside ONE per-partition pass:
    * the decoder lookup happens per row, the decoder state per
    * partition, exactly like a production `mapInPandas` decode stage
    * over heterogeneous media. Unified output schema: geom1/geom2 are
    * the format's natural geometry (sample rate × frames for audio,
    * width × height for images); feature is the format's verification
    * value (PCM energy / channel sums / palette-resolved pixel sum /
    * the JPEG bounded-error verdict as 0-or-1).
    */
  def dispatchDecode(docs: DataFrame, idCol: String, textCol: String,
                     width: Int = 16)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          java.lang.Math.floorMod(id, 5L).toInt match {
            case 0 =>
              val samples = Array.tabulate(bytes.length)(i =>
                (((bytes(i) & 0xff) - 128) * 256).toShort)
              val info = MediaCodecs.decodeWav(
                MediaCodecs.encodeWavPcm16(samples, 8000))
              (id, "wav", info.sampleRate.toLong, info.nFrames, info.energy)
            case 1 =>
              val rowBytes = width * 3
              val h = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
              val info = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp24(
                width, h, java.util.Arrays.copyOf(bytes, rowBytes * h)))
              (id, "bmp", info.width.toLong, info.height.toLong,
                info.sumChannels)
            case 2 =>
              val rowBytes = width * 3
              val h = math.max(1, (bytes.length + rowBytes - 1) / rowBytes)
              val info = MediaCodecs.decodePng(MediaCodecs.encodePng(
                width, h, 3, java.util.Arrays.copyOf(bytes, rowBytes * h)))
              (id, "png", info.width.toLong, info.height.toLong,
                info.sumChannels)
            case 3 =>
              val h = math.max(1, (bytes.length + width - 1) / width)
              val gray = java.util.Arrays.copyOf(bytes, width * h)
              val (dw, dh, decoded) =
                JpegCodec.decodeGray(JpegCodec.encodeGray(width, h, gray))
              val ok = dw == width && dh == h &&
                JpegCodec.meanAbsError(gray, decoded) <= 32.0
              (id, "jpeg", dw.toLong, dh.toLong, if (ok) 1L else 0L)
            case _ =>
              val h = math.max(1, (bytes.length + width - 1) / width)
              val info = MediaCodecs.decodeGif(MediaCodecs.encodeGif(
                width, h, java.util.Arrays.copyOf(bytes, width * h)))
              (id, "gif", info.width.toLong, info.height.toLong,
                info.sumPixels)
          }
        }
      }
      .toDF("doc_id", "format", "geom1", "geom2", "feature")
  }

}
