package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Media, MediaCodecs}

class MediaCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("WAV round trip: decoded fields equal encoded parameters") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = MediaCodecs.encodeWavPcm16(samples, sampleRate = 8000)
    val info = MediaCodecs.decodeWav(wav)
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.nFrames == 6)
    assert(info.durationMs == 6 * 1000L / 8000)
    assert(info.energy == samples.map(s => s.toLong * s).sum)
  }

  test("WAV decoder skips unknown chunks and honors word alignment") {
    val base = MediaCodecs.encodeWavPcm16(Array[Short](5, -5), 16000)
    // splice an odd-sized LIST chunk (3 bytes + 1 pad) between fmt and data
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val info = MediaCodecs.decodeWav(spliced)
    assert(info.sampleRate == 16000 && info.nFrames == 2 && info.energy == 50)
  }

  test("WAV decoder rejects non-RIFF, truncated, and non-PCM input") {
    intercept[IllegalArgumentException](MediaCodecs.decodeWav("not a wav at all".getBytes))
    val good = MediaCodecs.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(good.take(30)))
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(nonPcm))
  }

  test("BMP round trip: geometry from header, channel sum over padded rows") {
    // 3x2 image: rows are 9 bytes of payload + 3 pad bytes (12-byte rows)
    val channels = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 7 + 1).toByte)
    val bmp = MediaCodecs.encodeBmp24(3, 2, channels)
    val info = MediaCodecs.decodeBmp(bmp)
    assert(info.width == 3 && info.height == 2 && info.bitsPerPixel == 24)
    assert(info.sumChannels == channels.map(_ & 0xff).map(_.toLong).sum)
    // padding must exist and not contribute
    assert(bmp.length == 54 + 12 * 2)
  }

  test("BMP resize: nearest-neighbor picks exact stride pixels, re-encodes validly") {
    // 4×4 image whose channel bytes encode their own (x, y, c) position:
    // byte = (y*4 + x)*3 + c — so the resized pixels are checkable exactly
    val w = 4; val h = 4
    val ch = Array.tabulate(w * h * 3)(i => i.toByte)
    val bmp = MediaCodecs.encodeBmp24(w, h, ch)
    val resized = MediaCodecs.resizeBmp24(bmp, 2)
    val (wr, hr, rch) = MediaCodecs.bmpChannels(resized)
    assert(wr == 2 && hr == 2)
    // output (x, y) = input (2x, 2y): pixels (0,0) (2,0) (0,2) (2,2)
    val want = for (y <- Seq(0, 2); x <- Seq(0, 2); c <- 0 to 2)
      yield ((y * w + x) * 3 + c).toByte
    assert(rch.toSeq == want)
    // the resized container is itself a valid BMP with consistent sums
    val info = MediaCodecs.decodeBmp(resized)
    assert(info.width == 2 && info.height == 2 && info.bitsPerPixel == 24)
    assert(info.sumChannels == want.map(_.toInt & 0xff).sum.toLong)
    // factor larger than the image floors at 1×1 (top-left pixel survives)
    val tiny = MediaCodecs.bmpChannels(MediaCodecs.resizeBmp24(bmp, 10))
    assert(tiny._1 == 1 && tiny._2 == 1 && tiny._3.toSeq == ch.take(3).toSeq)
  }

  test("BMP decoder rejects non-BMP and truncated pixel data") {
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(Array.fill[Byte](54)(0)))
    val good = MediaCodecs.encodeBmp24(3, 2, new Array[Byte](18))
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(good.take(60)))
  }

  test("decoders fail CLEANLY on fuzzed input — reject or parse, never crash") {
    // Random garbage and bit-flipped valid containers must produce either
    // a successful parse or IllegalArgumentException — any other throw
    // (index out of bounds, divide by zero, negative allocation) is a
    // parser bug that would surface as an opaque executor failure.
    val rnd = new scala.util.Random(17)
    def check(bytes: Array[Byte], what: String): Unit =
      try { MediaCodecs.decodeWav(bytes); () } catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"decodeWav crashed on $what: $e")
      }
    def checkBmp(bytes: Array[Byte], what: String): Unit =
      try { MediaCodecs.decodeBmp(bytes); () } catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"decodeBmp crashed on $what: $e")
      }
    for (i <- 0 until 300) {
      val garbage = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt().toByte)
      check(garbage, s"garbage#$i"); checkBmp(garbage, s"garbage#$i")
    }
    val wav = MediaCodecs.encodeWavPcm16(Array[Short](1, -2, 3, -4), 8000)
    val bmp = MediaCodecs.encodeBmp24(3, 2, new Array[Byte](18))
    for (i <- 0 until 500) {
      val w = wav.clone(); w(rnd.nextInt(w.length)) = rnd.nextInt().toByte
      check(w, s"flipped-wav#$i")
      val b = bmp.clone(); b(rnd.nextInt(b.length)) = rnd.nextInt().toByte
      checkBmp(b, s"flipped-bmp#$i")
      // truncations at every boundary class
      check(wav.take(rnd.nextInt(wav.length)), s"truncated-wav#$i")
      checkBmp(bmp.take(rnd.nextInt(bmp.length)), s"truncated-bmp#$i")
    }
  }

  test("distributed WAV/BMP round trips agree with direct computation") {
    import spark.implicits._
    implicit val sp = spark
    val docs = Seq((1L, "hello world"), (2L, "x"), (3L, "a" * 100))
      .toDF("doc_id", "text")
    val wav = Media.wavRoundTrip(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((id, text) <- Seq((1L, "hello world"), (2L, "x"), (3L, "a" * 100))) {
      val e = text.getBytes("UTF-8").map(b => ((b & 0xff) - 128) * 256L)
        .map(s => s * s).sum
      assert(wav(id) == ((8000L, text.length.toLong,
        text.length * 1000L / 8000, e)), s"doc $id")
    }
    val bmp = Media.bmpRoundTrip(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(bmp(1L) == ((16L, 1L, 24L, "hello world".getBytes.map(_.toLong).sum)))
    assert(bmp(3L) == ((16L, 3L, 24L, 100L * 'a'.toLong))) // 100 bytes → 3 rows
  }
}
