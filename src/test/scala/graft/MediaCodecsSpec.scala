package graft

import graft.multimodal.MediaCodecs
import graft.multimodal.Multimodal.{AudioMeta, MediaMeta}
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level codec checks. The golden arrays are hand-written from the PNG
  * (RFC 2083) and BMP (BITMAPINFOHEADER) specs — independent of the
  * encoders, so an encoder and parser sharing a wrong offset/endianness
  * cannot pass by mirroring each other.
  */
class MediaCodecsSpec extends AnyFunSuite {

  // 1x1 RGB8 PNG signature + IHDR, CRC 0x907753DE (computed with zlib,
  // matches the widely published smallest-PNG header)
  private val goldenPng: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
    0x00, 0x00, 0x00, 0x0d,                         // IHDR length 13
    0x49, 0x48, 0x44, 0x52,                         // "IHDR"
    0x00, 0x00, 0x00, 0x01,                         // width 1 (BE)
    0x00, 0x00, 0x00, 0x01,                         // height 1 (BE)
    0x08, 0x02,                                     // depth 8, truecolor
    0x00, 0x00, 0x00,                               // compression/filter/interlace
    0x90, 0x77, 0x53, 0xde                          // CRC32
  ).map(_.toByte)

  // 2x3 24bpp BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40), LE
  private val goldenBmp: Array[Byte] = Array(
    0x42, 0x4d,             // "BM"
    0x36, 0x00, 0x00, 0x00, // file size 54
    0x00, 0x00, 0x00, 0x00, // reserved
    0x36, 0x00, 0x00, 0x00, // pixel offset 54
    0x28, 0x00, 0x00, 0x00, // DIB size 40
    0x02, 0x00, 0x00, 0x00, // width 2 (LE)
    0x03, 0x00, 0x00, 0x00, // height 3 (LE)
    0x01, 0x00,             // planes 1
    0x18, 0x00,             // 24 bpp
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00
  ).map(_.toByte)

  test("parses hand-written golden PNG and BMP headers") {
    assert(MediaCodecs.parseMeta(goldenPng).contains(MediaMeta(1, 1, 1, "png")))
    assert(MediaCodecs.parseMeta(goldenBmp).contains(MediaMeta(2, 3, 1, "bmp")))
  }

  test("encoders emit exactly the golden bytes") {
    assert(MediaCodecs.encodePng(1, 1).sameElements(goldenPng))
    assert(MediaCodecs.encodeBmp(2, 3).sameElements(goldenBmp))
  }

  test("encode/parse roundtrip over a dimension sweep") {
    for (w <- Seq(1, 7, 640, 65535); h <- Seq(1, 13, 480, 4096)) {
      assert(MediaCodecs.parseMeta(MediaCodecs.encodePng(w, h))
        .contains(MediaMeta(w, h, 1, "png")), s"png ${w}x$h")
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeBmp(w, h))
        .contains(MediaMeta(w, h, 1, "bmp")), s"bmp ${w}x$h")
    }
  }

  test("top-down BMP (negative height) parses to the magnitude") {
    val b = MediaCodecs.encodeBmp(4, 5)
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -5)
    assert(MediaCodecs.parseMeta(b).contains(MediaMeta(4, 5, 1, "bmp")))
  }

  // 4x2 GIF89a logical screen descriptor, LE u16 dims, no GCT
  private val goldenGif: Array[Byte] = Array(
    0x47, 0x49, 0x46, 0x38, 0x39, 0x61, // "GIF89a"
    0x04, 0x00,                         // width 4 (LE)
    0x02, 0x00,                         // height 2 (LE)
    0x00, 0x00, 0x00                    // packed, bg index, aspect
  ).map(_.toByte)

  // 8000 Hz mono 16-bit PCM WAV, 2 sample frames: canonical 44-byte header
  private val goldenWav: Array[Byte] = Array(
    0x52, 0x49, 0x46, 0x46,             // "RIFF"
    0x28, 0x00, 0x00, 0x00,             // chunk size 36 + 4 data bytes
    0x57, 0x41, 0x56, 0x45,             // "WAVE"
    0x66, 0x6d, 0x74, 0x20,             // "fmt "
    0x10, 0x00, 0x00, 0x00,             // fmt size 16
    0x01, 0x00,                         // PCM
    0x01, 0x00,                         // 1 channel
    0x40, 0x1f, 0x00, 0x00,             // 8000 Hz (LE)
    0x80, 0x3e, 0x00, 0x00,             // byte rate 16000
    0x02, 0x00,                         // block align 2
    0x10, 0x00,                         // 16 bits
    0x64, 0x61, 0x74, 0x61,             // "data"
    0x04, 0x00, 0x00, 0x00              // data size 4 = 2 frames
  ).map(_.toByte)

  test("parses hand-written golden GIF and WAV headers") {
    assert(MediaCodecs.parseMeta(goldenGif).contains(MediaMeta(4, 2, 1, "gif")))
    assert(MediaCodecs.parseWav(goldenWav)
      .contains(AudioMeta(8000, 1, 16, 2L, "pcm_wav")))
  }

  test("gif/wav encoders emit exactly the golden bytes") {
    assert(MediaCodecs.encodeGif(4, 2).sameElements(goldenGif))
    assert(MediaCodecs.encodeWav(8000, 1, 16, 2L).sameElements(goldenWav))
  }

  test("wav encode/parse roundtrip over a parameter sweep") {
    for (rate <- Seq(8000, 22050, 48000); ch <- Seq(1, 2);
         depth <- Seq(16, 24); n <- Seq(0L, 1L, 99999L)) {
      assert(MediaCodecs.parseWav(MediaCodecs.encodeWav(rate, ch, depth, n))
        .contains(AudioMeta(rate, ch, depth, n, "pcm_wav")),
        s"wav $rate/$ch/$depth/$n")
    }
    for (w <- Seq(1, 640, 65535); h <- Seq(1, 480))
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeGif(w, h))
        .contains(MediaMeta(w, h, 1, "gif")), s"gif ${w}x$h")
  }

  test("wav chunk walk skips a LIST chunk between fmt and data") {
    // RIFF + fmt, then a 6-byte LIST chunk (odd size → word-aligned pad),
    // then data: parseWav must land on the data size regardless.
    val base = MediaCodecs.encodeWav(16000, 2, 16, 7L)
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'I', 'N', 'F', 'O', 'x', 0)
    val spliced = base.take(36) ++ list ++ base.drop(36)
    assert(MediaCodecs.parseWav(spliced)
      .contains(AudioMeta(16000, 2, 16, 7L, "pcm_wav")))
  }

  test("mp4 encode/parse roundtrip and box-walk robustness") {
    import graft.multimodal.Multimodal.VideoMeta
    for (ts <- Seq(600, 1000, 90000); dur <- Seq(0L, 1L, 123456789L)) {
      assert(MediaCodecs.parseMp4(MediaCodecs.encodeMp4(ts, dur))
        .contains(VideoMeta(ts, dur, "mp4")), s"mp4 $ts/$dur")
    }
    // a free box between ftyp and moov must be skipped by the walk
    val base = MediaCodecs.encodeMp4(1000, 42L)
    val free = java.nio.ByteBuffer.allocate(12)
    free.putInt(12).put("free".getBytes("US-ASCII")).putInt(0)
    val spliced = base.take(16) ++ free.array() ++ base.drop(16)
    assert(MediaCodecs.parseMp4(spliced).contains(VideoMeta(1000, 42L, "mp4")))
    // garbage, truncation, missing mvhd
    assert(MediaCodecs.parseMp4("not a video at all, just some words".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.parseMp4(base.take(20)).isEmpty)
    assert(MediaCodecs.parseMp4(base.take(16)).isEmpty) // ftyp only, no moov
  }

  test("wav rejects non-PCM, truncated, and RIFF-prefixed garbage") {
    assert(MediaCodecs.parseWav("RIFF but actually prose, not audio data!!".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.parseWav(goldenWav.take(30)).isEmpty)
    val nonPcm = goldenWav.clone
    nonPcm(20) = 3 // IEEE float format code
    assert(MediaCodecs.parseWav(nonPcm).isEmpty)
    val badAlign = goldenWav.clone
    badAlign(32) = 5 // block align inconsistent with channels*depth/8
    assert(MediaCodecs.parseWav(badAlign).isEmpty)
  }

  test("pixel BMP: encode/decode roundtrip undoes BGR, bottom-up and padding") {
    // 2x2 distinct-channel pixels: roundtrip must return EXACTLY the input
    // (any flipped channel, wrong row order, or stride slip changes bytes)
    val rgb = Array[Byte](
      10, 20, 30,   40, 50, 60,   // row 0: (r g b)(r g b)
      70, 80, 90,  100, 110, 120) // row 1
    val bmp = MediaCodecs.encodeBmpRgb(2, 2, rgb)
    // spec fields: 24bpp, bottom-up positive height, padded stride 8
    assert(bmp.length == 54 + 8 * 2)
    val buf = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt(2) == bmp.length && buf.getInt(10) == 54)
    assert(buf.getInt(18) == 2 && buf.getInt(22) == 2 && buf.getShort(28) == 24)
    // bottom-up: first stored row is rgb row 1; BGR within a pixel
    assert(bmp(54) == 90 && bmp(55) == 80 && bmp(56) == 70)
    val Some((w, h, back)) = MediaCodecs.parseBmpPixels(bmp)
    assert(w == 2 && h == 2 && back.sameElements(rgb))
    // top-down (negative height) input decodes to the same raster
    val neg = bmp.clone()
    val nb = java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nb.putInt(22, -2)
    // rows must be swapped in the payload for the same logical image
    Array.copy(bmp, 54, neg, 62, 8); Array.copy(bmp, 62, neg, 54, 8)
    val Some((_, _, back2)) = MediaCodecs.parseBmpPixels(neg)
    assert(back2.sameElements(rgb))
  }

  test("pixel BMP: hostile bytes never throw, never over-allocate") {
    assert(MediaCodecs.parseBmpPixels("BM plain prose".getBytes("UTF-8")).isEmpty)
    val ok = MediaCodecs.encodeBmpRgb(3, 3, Array.fill[Byte](27)(1))
    assert(MediaCodecs.parseBmpPixels(ok).nonEmpty)
    assert(MediaCodecs.parseBmpPixels(ok.take(40)).isEmpty)       // truncated header
    assert(MediaCodecs.parseBmpPixels(ok.take(58)).isEmpty)       // truncated pixels
    val huge = ok.clone()
    java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 1 << 20).putInt(22, 1 << 20)                    // 1 TB raster claim
    assert(MediaCodecs.parseBmpPixels(huge).isEmpty)
    val compressed = ok.clone()
    java.nio.ByteBuffer.wrap(compressed).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1)                                              // BI_RLE8
    assert(MediaCodecs.parseBmpPixels(compressed).isEmpty)
    val headerOnly = MediaCodecs.encodeBmp(4, 4)                  // no pixel array
    assert(MediaCodecs.parseBmpPixels(headerOnly).isEmpty)
  }

  test("nearest-neighbor resize: floor mapping, identity, and downscale") {
    val rgb = Array.tabulate[Byte](4 * 2 * 3)(i => i.toByte) // 4x2
    // identity resize returns the same raster
    assert(MediaCodecs.resizeNearestRgb(rgb, 4, 2, 4, 2).sameElements(rgb))
    // 4x2 -> 2x1: output (ox,oy) samples input (ox*4/2, oy*2/1) = (2ox, 0)
    val half = MediaCodecs.resizeNearestRgb(rgb, 4, 2, 2, 1)
    assert(half.sameElements(Array[Byte](0, 1, 2, 6, 7, 8)))
    // upscale 1x1 -> 3x3 replicates the single pixel
    val up = MediaCodecs.resizeNearestRgb(Array[Byte](5, 6, 7), 1, 1, 3, 3)
    val expected: Array[Byte] = Array.fill(9)(Seq[Byte](5, 6, 7)).flatten
    assert(up.sameElements(expected))
  }

  test("PCM WAV: int16 roundtrip, negative samples, hostile truncation") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = MediaCodecs.encodeWavPcm16(8000, samples)
    assert(wav.length == 44 + samples.length * 2)
    val Some((meta, back)) = MediaCodecs.parseWavPcm16(wav)
    assert(meta.sample_rate == 8000 && meta.channels == 1 && meta.bit_depth == 16)
    assert(meta.n_samples == samples.length && back.sameElements(samples))
    // LE byte order on disk: 12345 = 0x3039 stored 0x39 0x30
    assert((wav(44 + 10 * 1) & 0xff) == 0x39 && (wav(44 + 11) & 0xff) == 0x30)
    // truncated data chunk is rejected, not zero-padded
    assert(MediaCodecs.parseWavPcm16(wav.take(wav.length - 2)).isEmpty)
    // stereo/24-bit payloads fall outside the pcm16 decoder
    assert(MediaCodecs.parseWavPcm16(MediaCodecs.encodeWav(8000, 2, 16, 4)).isEmpty)
    assert(MediaCodecs.parseWavPcm16(MediaCodecs.encodeWav(8000, 1, 24, 4)).isEmpty)
    assert(MediaCodecs.parseWavPcm16("RIFF garbage".getBytes("UTF-8")).isEmpty)
  }

  test("audio features: hand-computed peak, energy, zero crossings") {
    import graft.multimodal.Multimodal
    val spark = TestSpark.spark
    import spark.implicits._
    // signal: 3, -2, 0, -1 → peak 3, sum_sq 9+4+0+1 = 14, crossings at
    // 3→-2, -2→0 (zero counts positive), 0→-1 = 3
    val wav = MediaCodecs.encodeWavPcm16(16000, Array[Short](3, -2, 0, -1))
    val rows = Multimodal.audioFeatures(
        Seq(Multimodal.MediaRow(7L, wav)).toDS())
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.n_samples == 4 && r.peak == 3 && r.sum_sq == 14 && r.zero_crossings == 3)
    // non-WAV payloads are dropped, not faked
    assert(Multimodal.audioFeatures(
      Seq(Multimodal.MediaRow(8L, "not audio".getBytes("UTF-8"))).toDS())
      .collect().isEmpty)
  }

  test("PNG raster: deflate roundtrip through the real inflate + defilter path") {
    val rgb = Array.tabulate[Byte](6 * 4 * 3)(i => ((i * 37) % 256).toByte)
    val png = MediaCodecs.encodePngRgb(6, 4, rgb)
    // it is a real spec-conformant file the header parser also accepts
    assert(MediaCodecs.parseMeta(png).exists(m => m.width == 6 && m.height == 4))
    val Some((w, h, back)) = MediaCodecs.parsePngPixels(png)
    assert(w == 6 && h == 4 && back.sameElements(rgb))
    // hostile: truncated IDAT, corrupt deflate byte, hostile dims
    assert(MediaCodecs.parsePngPixels(png.take(png.length - 20)).isEmpty)
    val corrupt = png.clone(); corrupt(8 + 25 + 12) = 0x55 // inside IDAT data
    assert(MediaCodecs.parsePngPixels(corrupt).isEmpty ||
      !MediaCodecs.parsePngPixels(corrupt).get._3.sameElements(rgb))
    assert(MediaCodecs.parsePngPixels("not a png".getBytes("UTF-8")).isEmpty)
    // ADAM7 interlace: per-pixel distinct values so any pass-geometry slip
    // (wrong sub-image dims, wrong scatter grid, wrong per-pass filter
    // reset) breaks byte equality; dims straddle the pass edges — 1x1
    // (pass 1 only), 3x3/5x7 (short passes), 8x8 (one full cycle), 17x10
    (Seq((1, 1), (3, 3), (5, 7), (8, 8), (17, 10))).foreach { case (w2, h2) =>
      val r2 = Array.tabulate[Byte](w2 * h2 * 3)(i => ((i * 31 + 7) % 256).toByte)
      val ipng = MediaCodecs.encodePngRgb(w2, h2, r2, interlaced = true)
      assert((ipng(28) & 0xff) == 1, "interlace byte not set") // IHDR data[12]
      val di = MediaCodecs.parsePngPixels(ipng)
      assert(di.isDefined, s"adam7 ${w2}x$h2")
      assert(di.get._3.sameElements(r2), s"adam7 ${w2}x$h2 raster")
      // the plain encoding of the same raster decodes identically
      assert(MediaCodecs.parsePngPixels(MediaCodecs.encodePngRgb(w2, h2, r2))
        .get._3.sameElements(r2))
    }
    // hostile: single-byte fuzz over an interlaced container never throws
    val fz = MediaCodecs.encodePngRgb(17, 10,
      Array.tabulate[Byte](17 * 10 * 3)(i => (i % 251).toByte), interlaced = true)
    (0 until fz.length).foreach { i =>
      val c = fz.clone; c(i) = (c(i) ^ 0x5a).toByte
      MediaCodecs.parsePngPixels(c)
    }
    // flipping interlace OFF on an Adam7 stream mis-sizes the scanline
    // stream -> clean reject (the raw-length check), never a scrambled decode
    val off7 = fz.clone; off7(28) = 0
    // IHDR CRC now wrong too; either rejection path is fine
    assert(MediaCodecs.parsePngPixels(off7).isEmpty ||
      !MediaCodecs.parsePngPixels(off7).get._3.sameElements(fz))
  }

  test("PNG defilter: Sub, Up, Average and Paeth rows, hand-computed") {
    // 2x4 truecolor PNG built by hand, one row per filter type
    val raw = Array[Byte](
      1, 10, 20, 30, 5, 6, 7,    // Sub
      2, 1, 2, 3, 4, 5, 6,       // Up
      3, 10, 10, 10, 10, 10, 10, // Average
      4, 1, 1, 1, 2, 2, 2)       // Paeth
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zb.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      out.putInt(data.length).put(tpe.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(out.array(), 4, 4 + data.length)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.BIG_ENDIAN)
    ihdr.putInt(2).putInt(4).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val png = sig ++ chunk("IHDR", ihdr.array()) ++ chunk("IDAT", zb.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
    val Some((w, h, px)) = MediaCodecs.parsePngPixels(png)
    assert(w == 2 && h == 4)
    val expected = Array[Byte](
      10, 20, 30, 15, 26, 37, // Sub: px1 = px0 + delta
      11, 22, 33, 19, 31, 43, // Up: row0 + raw
      15, 21, 26, 27, 36, 44, // Average of left/up
      16, 22, 27, 29, 38, 46) // Paeth picks up both times here
    assert(px.sameElements(expected))
  }

  test("image stats: hand-computed channel sums and peak integer luma") {
    import graft.multimodal.Multimodal
    val spark = TestSpark.spark
    import spark.implicits._
    // pixels (10,20,30) and (200,100,50): sums 210/120/80;
    // lumas 18150//1000=18 and 124200//1000=124 → max 124
    val rgb = Array[Byte](10, 20, 30, 200.toByte, 100, 50)
    val bmp = MediaCodecs.encodeBmpRgb(2, 1, rgb)
    val rows = Multimodal.imageStats(
      Seq(Multimodal.MediaRow(3L, bmp)).toDS()).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.width == 2 && r.height == 1)
    assert(r.sum_r == 210 && r.sum_g == 120 && r.sum_b == 80 && r.max_luma == 124)
    // non-BMP payloads drop out
    assert(Multimodal.imageStats(
      Seq(Multimodal.MediaRow(4L, "nope".getBytes("UTF-8"))).toDS())
      .collect().isEmpty)
  }

  test("GIF raster: LZW roundtrip over gradients, palettes, and dict resets") {
    // palette-bounded gradient (<= 200 colors)
    def gradient(w: Int, h: Int): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x + 2 * y) % 200
        val p = (y * w + x) * 3
        rgb(p) = v.toByte; rgb(p + 1) = (2 * v % 256).toByte; rgb(p + 2) = (3 * v % 256).toByte
      }
      rgb
    }
    for ((w, h) <- Seq((1, 1), (3, 2), (13, 7), (64, 48), (100, 90))) {
      val rgb = gradient(w, h)
      val dec = MediaCodecs.parseGifPixels(MediaCodecs.encodeGifRgb(w, h, rgb))
      assert(dec.isDefined, s"gif ${w}x$h")
      val (dw, dh, drgb) = dec.get
      assert(dw == w && dh == h && drgb.sameElements(rgb), s"gif ${w}x$h raster")
    }
    // 256-color noise, large enough to fill the 4096-entry dictionary and
    // force a mid-stream clear-code reset
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(120 * 80 * 3)(rnd.nextInt(256).toByte)
    // clamp to 256 distinct colors by quantizing each pixel to its red byte
    for (p <- 0 until 120 * 80) {
      noise(p * 3 + 1) = noise(p * 3); noise(p * 3 + 2) = ((noise(p * 3) & 0xff) / 2).toByte
    }
    val dec = MediaCodecs.parseGifPixels(MediaCodecs.encodeGifRgb(120, 80, noise))
    assert(dec.isDefined && dec.get._3.sameElements(noise))
    // two-color minimum palette (minCode floor of 2)
    val bw = Array.tabulate(10 * 10 * 3)(i => if ((i / 3) % 2 == 0) 0.toByte else 255.toByte)
    val decBw = MediaCodecs.parseGifPixels(MediaCodecs.encodeGifRgb(10, 10, bw))
    assert(decBw.isDefined && decBw.get._3.sameElements(bw))
    // INTERLACED roundtrip: every row a distinct color so any 4-pass
    // deinterlace slip breaks byte equality; heights straddle the pass
    // edges (1 = pass-1-only, 5 = every pass short, 17 = full passes)
    for ((w, h) <- Seq((7, 1), (5, 5), (9, 17), (16, 48))) {
      val rgb = Array.tabulate(w * h * 3) { i =>
        val row = (i / 3) / w
        (i % 3 match { case 0 => row; case 1 => 255 - row; case _ => 7 * row }).toByte
      }
      val enc = MediaCodecs.encodeGifRgb(w, h, rgb, interlaced = true)
      // the interlace flag is really set in the image descriptor
      assert((0 until enc.length - 10).exists(i =>
        enc(i) == 0x2c.toByte && (enc(i + 9) & 0x40) != 0))
      val di = MediaCodecs.parseGifPixels(enc)
      assert(di.isDefined, s"interlaced ${w}x$h")
      assert(di.get._3.sameElements(rgb), s"interlaced ${w}x$h deinterlace")
      // and the plain encoding of the same raster decodes identically
      assert(MediaCodecs.parseGifPixels(MediaCodecs.encodeGifRgb(w, h, rgb))
        .get._3.sameElements(rgb))
    }
    // hostile: fuzz over an interlaced container never throws
    val ienc = MediaCodecs.encodeGifRgb(9, 17, gradient(9, 17), interlaced = true)
    (0 until ienc.length).foreach { i =>
      val c = ienc.clone; c(i) = (c(i) ^ 0x5a).toByte
      MediaCodecs.parseGifPixels(c)
    }
  }

  test("GIF raster: header meta still parses; hostile bytes never throw") {
    val rgb = Array.tabulate(8 * 5 * 3)(i => ((i / 3) % 100).toByte)
    val file = MediaCodecs.encodeGifRgb(8, 5, rgb)
    // the meta parser sees the same file (dims from the screen descriptor)
    assert(MediaCodecs.parseMeta(file).contains(MediaMeta(8, 5, 1, "gif")))
    // truncation at every prefix must not throw; any prefix that cuts into
    // the pixel framing (everything before the block terminator) must not
    // decode — only the trailer byte is droppable with the raster whole
    (0 until file.length).foreach { n =>
      val dec = MediaCodecs.parseGifPixels(file.take(n))
      if (n < file.length - 1) assert(dec.isEmpty, s"decoded at truncation $n")
    }
    // flipping the interlace flag on a sequentially-stored stream decodes
    // (the deinterlace path) but PERMUTES the rows — proof the 4-pass row
    // map is actually applied, not ignored
    val interlaced = file.clone
    val idOff = file.indexOfSlice(Seq(0x2c.toByte))
    interlaced(idOff + 9) = (interlaced(idOff + 9) | 0x40).toByte
    val scrambled = MediaCodecs.parseGifPixels(interlaced)
    assert(scrambled.isDefined && !scrambled.get._3.sameElements(rgb))
    // ...and the permutation is exactly the 4-pass order: stored row s
    // lands at display row order(s) (h=5 -> order 0,4,2,1,3)
    val order = Seq(0, 4, 2, 1, 3)
    val want = new Array[Byte](rgb.length)
    for (s <- 0 until 5; x <- 0 until 8 * 3)
      want(order(s) * 8 * 3 + x) = rgb(s * 8 * 3 + x)
    assert(scrambled.get._3.sameElements(want))
    // corrupt LZW payload byte: decode fails cleanly (None), never throws
    val corrupt = file.clone
    corrupt(file.length - 5) = 0x7f.toByte
    MediaCodecs.parseGifPixels(corrupt)
    // random bytes behind a GIF signature never throw
    val rnd = new scala.util.Random(99)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(120) + 13)(rnd.nextInt(256).toByte)
      "GIF89a".getBytes("US-ASCII").copyToArray(junk)
      MediaCodecs.parseGifPixels(junk)
    }
  }

  test("JPEG: marker walk recovers SOF dims; baseline and progressive") {
    for (w <- Seq(1, 7, 640, 65535); h <- Seq(1, 13, 480, 4096)) {
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeJpeg(w, h))
        .contains(MediaMeta(w, h, 1, "jpeg")), s"jpeg ${w}x$h")
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeJpeg(w, h, progressive = true))
        .contains(MediaMeta(w, h, 1, "jpeg")), s"jpeg-prog ${w}x$h")
    }
    assert(MediaCodecs.encodeJpeg(640, 480).length == MediaCodecs.JpegHeaderLen)
  }

  test("JPEG: hand-written golden header, fill bytes, and RST/TEM skip") {
    // minimal golden: SOI, APP0(JFIF), SOF0 3x5 — built by hand, not via
    // the encoder, so the parser is pinned against the spec layout itself
    val golden = Array[Int](
      0xff, 0xd8,                                                 // SOI
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, 0x01,
      0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,             // APP0 len16
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x05, 0x00, 0x03,
      0x01, 0x01, 0x11, 0x00                                      // SOF0 1-comp h=5 w=3
    ).map(_.toByte)
    assert(MediaCodecs.parseMeta(golden).contains(MediaMeta(3, 5, 1, "jpeg")))
    // fill bytes before a marker (FF FF FF C0 ...) are legal padding
    val filled = Array[Int](0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0, 0x00, 0x0b,
      0x08, 0x00, 0x02, 0x00, 0x04, 0x01, 0x01, 0x11, 0x00).map(_.toByte)
    assert(MediaCodecs.parseMeta(filled).contains(MediaMeta(4, 2, 1, "jpeg")))
    // standalone TEM/RST markers (no length field) are skipped
    val withRst = Array[Int](0xff, 0xd8, 0xff, 0x01, 0xff, 0xd5, 0xff, 0xc2,
      0x00, 0x0b, 0x08, 0x00, 0x07, 0x00, 0x06, 0x01, 0x01, 0x11, 0x00).map(_.toByte)
    assert(MediaCodecs.parseMeta(withRst).contains(MediaMeta(6, 7, 1, "jpeg")))
  }

  test("JPEG: hostile bytes never parse and never throw") {
    // SOS before SOF (dims unreadable), EOI-only, zero dims, bad lengths,
    // DHT masquerading as SOF, truncation at every prefix of a real header
    val sosFirst = Array[Int](0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x00, 0x00).map(_.toByte)
    assert(MediaCodecs.parseMeta(sosFirst).isEmpty)
    assert(MediaCodecs.parseMeta(Array[Int](0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    val zeroW = MediaCodecs.encodeJpeg(1, 1).clone
    zeroW(107) = 0x00 // width low byte of the 1x1 header
    assert(MediaCodecs.parseMeta(zeroW).isEmpty)
    val badLen = Array[Int](0xff, 0xd8, 0xff, 0xe0, 0x00, 0x01).map(_.toByte)
    assert(MediaCodecs.parseMeta(badLen).isEmpty)
    val dht = Array[Int](0xff, 0xd8, 0xff, 0xc4, 0x00, 0x0b, 0x08, 0x00, 0x05,
      0x00, 0x03, 0x01, 0x01, 0x11, 0x00).map(_.toByte)
    assert(MediaCodecs.parseMeta(dht).isEmpty) // DHT is not a frame header
    val full = MediaCodecs.encodeJpeg(33, 44)
    (0 until full.length).foreach { n =>
      MediaCodecs.parseMeta(full.take(n)) // must not throw at any truncation
    }
    // random bytes after a JPEG SOI must never throw
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(64) + 2)(rnd.nextInt(256).toByte)
      junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte
      MediaCodecs.parseMeta(junk)
    }
  }

  test("WebP: all three variants roundtrip; sync/signature and truncation reject") {
    // dimension sweep through each container variant
    for ((w, h) <- Seq((1, 1), (2, 3), (640, 480), (16383, 16383))) {
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeWebpLossy(w, h))
        .contains(MediaMeta(w, h, 1, "webp")), s"lossy ${w}x$h")
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeWebpLossless(w, h))
        .contains(MediaMeta(w, h, 1, "webp")), s"lossless ${w}x$h")
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeWebpExtended(w, h))
        .contains(MediaMeta(w, h, 1, "webp")), s"extended ${w}x$h")
    }
    // VP8X goes past the 14-bit frame limit (canvas dims are 24-bit)
    assert(MediaCodecs.parseMeta(MediaCodecs.encodeWebpExtended(100000, 70000))
      .contains(MediaMeta(100000, 70000, 1, "webp")))
    // wrong VP8 sync code rejects
    val badSync = MediaCodecs.encodeWebpLossy(4, 5).clone
    badSync(23) = 0x00
    assert(MediaCodecs.parseMeta(badSync).isEmpty)
    // wrong VP8L signature byte rejects
    val badSig = MediaCodecs.encodeWebpLossless(4, 5).clone
    badSig(20) = 0x00
    assert(MediaCodecs.parseMeta(badSig).isEmpty)
    // a WAV (also RIFF) must not parse as WebP, and vice versa
    assert(MediaCodecs.parseMeta(MediaCodecs.encodeWav(8000, 1, 16, 10)).isEmpty)
    assert(MediaCodecs.parseWav(MediaCodecs.encodeWebpLossy(4, 5)).isEmpty)
    // truncation at every prefix must never throw
    Seq(MediaCodecs.encodeWebpLossy(33, 44), MediaCodecs.encodeWebpLossless(33, 44),
        MediaCodecs.encodeWebpExtended(33, 44)).foreach { full =>
      (0 until full.length).foreach(n => MediaCodecs.parseMeta(full.take(n)))
    }
    // random bytes after a RIFF....WEBP prefix must never throw
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(48) + 12)(rnd.nextInt(256).toByte)
      "RIFF".getBytes.copyToArray(junk, 0)
      if (junk.length >= 12) "WEBP".getBytes.copyToArray(junk, 8)
      MediaCodecs.parseMeta(junk)
    }
  }

  test("TIFF: both byte orders roundtrip; malformed IFDs reject, never throw") {
    for ((w, h) <- Seq((1, 1), (2, 3), (640, 480), (70000, 90000))) {
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeTiff(w, h))
        .contains(MediaMeta(w, h, 1, "tiff")), s"LE ${w}x$h")
      assert(MediaCodecs.parseMeta(MediaCodecs.encodeTiff(w, h, bigEndian = true))
        .contains(MediaMeta(w, h, 1, "tiff")), s"BE ${w}x$h")
    }
    // wrong magic (43) rejects
    val badMagic = MediaCodecs.encodeTiff(4, 5).clone
    badMagic(2) = 43
    assert(MediaCodecs.parseMeta(badMagic).isEmpty)
    // IFD offset pointing past the buffer rejects
    val badIfd = MediaCodecs.encodeTiff(4, 5).clone
    badIfd(4) = 0xf0.toByte
    assert(MediaCodecs.parseMeta(badIfd).isEmpty)
    // "II" prose must not parse (magic check), truncations never throw
    assert(MediaCodecs.parseMeta(
      "III: a roman numeral, not an image file at all.".getBytes("UTF-8")).isEmpty)
    val full = MediaCodecs.encodeTiff(33, 44, bigEndian = true)
    (0 until full.length).foreach(n => MediaCodecs.parseMeta(full.take(n)))
    // hostile entry-count fuzz after a valid header must never throw
    val rnd = new scala.util.Random(29)
    (0 until 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(56) + 8)(rnd.nextInt(256).toByte)
      junk(0) = 'I'; junk(1) = 'I'; junk(2) = 42; junk(3) = 0
      MediaCodecs.parseMeta(junk)
    }
  }

  test("EXIF audit: orientation + GPS flag in both byte orders; default orientation") {
    import graft.multimodal.Multimodal.ExifMeta
    for (be <- Seq(false, true); o <- Seq(1, 3, 6, 8); gps <- Seq(false, true)) {
      val b = MediaCodecs.encodeTiffExif(11, 22, o, gps, be)
      assert(MediaCodecs.parseExif(b).contains(ExifMeta(11, 22, o, gps)),
        s"be=$be o=$o gps=$gps")
      // the plain decode path still reads the same container's dims
      assert(MediaCodecs.parseMeta(b).contains(MediaMeta(11, 22, 1, "tiff")))
    }
    // a TIFF without an orientation entry audits as orientation 1, no GPS
    assert(MediaCodecs.parseExif(MediaCodecs.encodeTiff(5, 6))
      .contains(ExifMeta(5, 6, 1, false)))
    // out-of-range orientation value falls back to 1 (never propagates junk)
    val bad = MediaCodecs.encodeTiffExif(5, 6, 2, withGps = false).clone
    bad(54) = 99.toByte // orientation SHORT low byte (LE: entry 4's value field)
    assert(MediaCodecs.parseExif(bad).contains(ExifMeta(5, 6, 1, false)))
    // non-TIFF payloads do not audit
    assert(MediaCodecs.parseExif(MediaCodecs.encodeWebpLossy(3, 3)).isEmpty)
    (0 until 80).foreach(n =>
      MediaCodecs.parseExif(MediaCodecs.encodeTiffExif(9, 9, 5, withGps = true).take(n)))
  }

  test("JPEG raster: block-constant grays roundtrip bit-exactly through the baseline pipeline") {
    // per-8x8-block constants make every DCT block DC-only (all AC exactly
    // zero); with the flat Q=8 table the quantized DC is v-128 exactly, so
    // encode -> Huffman -> dequant -> IDCT must reproduce every input byte.
    // Restart markers every 2 MCUs exercise RSTn + DC-predictor resets.
    val w = 24; val h = 16
    val gray = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      gray(y * w + x) = (((x / 8) * 13 + (y / 8) * 7 * 5) % 256).toByte
    for (rst <- Seq(0, 2)) {
      val enc = MediaCodecs.encodeJpegGray(w, h, gray, quant = 8, restartInterval = rst)
      val Some((dw, dh, rgb)) = MediaCodecs.parseJpegPixels(enc)
      assert((dw, dh) == (w, h))
      for (i <- 0 until w * h) {
        assert((rgb(i * 3) & 0xff) == (gray(i) & 0xff), s"pixel $i rst=$rst")
        assert(rgb(i * 3) == rgb(i * 3 + 1) && rgb(i * 3) == rgb(i * 3 + 2))
      }
    }
  }

  test("JPEG raster: smooth gradients survive quant=1 with zero error, odd dims within 1") {
    // with every quant entry 1 the only loss is fDCT/IDCT double rounding
    val w = 24; val h = 16
    val g = Array.tabulate[Byte](w * h)(i => ((i % w) * 5 + (i / w) * 3).toByte)
    val Some((_, _, rgb)) = MediaCodecs.parseJpegPixels(MediaCodecs.encodeJpegGray(w, h, g, quant = 1))
    for (i <- 0 until w * h)
      assert((rgb(i * 3) & 0xff) == (g(i) & 0xff), s"pixel $i")
    // dims not a multiple of 8: edge blocks are edge-replicate padded at
    // encode and cropped at decode; DCT rounding may cost 1 count
    val w2 = 13; val h2 = 11
    val g2 = Array.tabulate[Byte](w2 * h2)(i => ((i * 7) % 256).toByte)
    val Some((dw2, dh2, rgb2)) = MediaCodecs.parseJpegPixels(MediaCodecs.encodeJpegGray(w2, h2, g2, quant = 1))
    assert((dw2, dh2) == (w2, h2))
    for (i <- 0 until w2 * h2)
      assert(math.abs((rgb2(i * 3) & 0xff) - (g2(i) & 0xff)) <= 1, s"pixel $i")
  }

  test("JPEG raster: 4:4:4 and 4:2:0 color decode matches the pinned YCbCr->RGB conversion") {
    def cl(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
    def expectRgb(yv: Int, cb0: Int, cr0: Int): (Int, Int, Int) = {
      val cb = cb0 - 128; val cr = cr0 - 128
      (cl(yv + 1.402 * cr), cl(yv - 0.344136 * cb - 0.714136 * cr), cl(yv + 1.772 * cb))
    }
    val w = 32; val h = 32
    val yP = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      yP(y * w + x) = (((x / 8) * 40 + (y / 8) * 20 + 30) % 256).toByte
    // 4:4:4: all three planes block-constant at full resolution
    val cbF = yP.map(v => ((v & 0xff) / 2 + 64).toByte)
    val crF = yP.map(v => (255 - (v & 0xff)).toByte)
    val Some((_, _, c444)) = MediaCodecs.parseJpegPixels(
      MediaCodecs.encodeJpegYcbcr444(w, h, yP, cbF, crF, quant = 8))
    for (i <- 0 until w * h) {
      val (er, eg, eb) = expectRgb(yP(i) & 0xff, cbF(i) & 0xff, crF(i) & 0xff)
      assert((c444(i * 3) & 0xff, c444(i * 3 + 1) & 0xff, c444(i * 3 + 2) & 0xff) == ((er, eg, eb)), s"444 pixel $i")
    }
    // 4:2:0: luma constant per 16x16 macroblock so each of its four 8x8
    // blocks is DC-only; chroma block-constant at half resolution
    val y420 = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      y420(y * w + x) = (((x / 16) * 60 + (y / 16) * 30 + 40) % 256).toByte
    val cw = w / 2; val ch = h / 2
    val cbH = new Array[Byte](cw * ch); val crH = new Array[Byte](cw * ch)
    for (y <- 0 until ch; x <- 0 until cw) {
      cbH(y * cw + x) = (((x / 8) * 20 + 100) % 256).toByte
      crH(y * cw + x) = (((y / 8) * 25 + 110) % 256).toByte
    }
    val Some((_, _, c420)) = MediaCodecs.parseJpegPixels(
      MediaCodecs.encodeJpegYcbcr420(w, h, y420, cbH, crH, quant = 8))
    for (y <- 0 until h; x <- 0 until w) {
      val (er, eg, eb) = expectRgb(y420(y * w + x) & 0xff,
        cbH((y / 2) * cw + x / 2) & 0xff, crH((y / 2) * cw + x / 2) & 0xff)
      val p = (y * w + x) * 3
      assert((c420(p) & 0xff, c420(p + 1) & 0xff, c420(p + 2) & 0xff) == ((er, eg, eb)), s"420 ($x,$y)")
    }
  }

  test("JPEG raster: hostile bytes, truncation, progressive, and header-only streams never decode or throw") {
    val gray = Array.tabulate[Byte](64)(i => (i * 4).toByte)
    val good = MediaCodecs.encodeJpegGray(8, 8, gray, quant = 1)
    assert(MediaCodecs.parseJpegPixels(good).isDefined)
    // every truncation that cuts into the entropy data fails cleanly (the
    // trailing EOI marker is not required for a complete scan, so only
    // cuts strictly before it can invalidate the stream)
    (0 until good.length - 2).foreach(n => assert(MediaCodecs.parseJpegPixels(good.take(n)).isEmpty))
    // single-byte corruptions never throw (most still decode to SOMETHING
    // when the flipped byte is entropy data -- that is lossy-format life --
    // but marker/table corruption must reject, and nothing may crash)
    for (i <- good.indices) {
      val bad = good.clone; bad(i) = (bad(i) ^ 0x55).toByte
      MediaCodecs.parseJpegPixels(bad)
    }
    // arbitrary junk and prose
    assert(MediaCodecs.parseJpegPixels(Array.tabulate[Byte](300)(i => (i * 37).toByte)).isEmpty)
    assert(MediaCodecs.parseJpegPixels("ffd8 is not how files start".getBytes("UTF-8")).isEmpty)
    // the header-only fixture encoders (no scan data) must not raster-decode
    assert(MediaCodecs.parseJpegPixels(MediaCodecs.encodeJpeg(10, 10)).isEmpty)
    assert(MediaCodecs.parseJpegPixels(MediaCodecs.encodeJpeg(10, 10, progressive = true)).isEmpty)
    // a PROGRESSIVE frame marker spliced onto a baseline scan rejects: the
    // baseline SOS (Ss=0, Se=63) is not a legal progressive scan header
    val prog = good.clone
    val sof = (2 until prog.length - 1).find(i => prog(i) == 0xff.toByte && prog(i + 1) == 0xc0.toByte).get
    prog(sof + 1) = 0xc2.toByte
    assert(MediaCodecs.parseJpegPixels(prog).isEmpty)
  }

  test("JPEG progressive: decodes identically to the baseline stream of the same raster") {
    // gradients (dense nonzero ACs, both signs), block patterns, and odd
    // dims, at quants that exercise magnitudes across the refinement
    // splits; the progressive scan script's refinement chain completes, so
    // decoded rasters must be byte-identical to the BASELINE encoding of
    // the same plane — two independently-derived streams, one truth
    for ((w, h, quant) <- Seq((8, 8, 1), (16, 16, 8), (24, 16, 2), (13, 9, 4), (40, 32, 16))) {
      val gray = Array.tabulate[Byte](w * h) { i =>
        val x = i % w; val y = i / w
        ((x * 7 + y * 13 + (x * y) % 31) % 256).toByte
      }
      val base = MediaCodecs.encodeJpegGray(w, h, gray, quant)
      val prog = MediaCodecs.encodeJpegGrayProgressive(w, h, gray, quant)
      val Some((bw, bh, bRgb)) = MediaCodecs.parseJpegPixels(base)
      val Some((pw, ph, pRgb)) = MediaCodecs.parseJpegPixels(prog)
      assert((bw, bh) == (w, h) && (pw, ph) == (w, h))
      assert(pRgb.sameElements(bRgb), s"progressive != baseline at ${w}x$h q=$quant")
    }
    // parseMeta still reads the SOF2 header dims
    val p = MediaCodecs.encodeJpegGrayProgressive(16, 8, new Array[Byte](128), 8)
    // hostile: truncations and single-byte fuzz never throw
    (0 until p.length by 3).foreach(n => MediaCodecs.parseJpegPixels(p.take(n)))
    for (i <- p.indices) {
      val bad = p.clone; bad(i) = (bad(i) ^ 0x55).toByte
      MediaCodecs.parseJpegPixels(bad)
    }
    // a DC-only (block-constant) progressive image reconstructs exactly at
    // the flat Q=8 table — the oracle trick the query row relies on
    val flat = Array.fill[Byte](16 * 16)(77.toByte)
    val Some((_, _, rgb)) = MediaCodecs.parseJpegPixels(
      MediaCodecs.encodeJpegGrayProgressive(16, 16, flat, quant = 8))
    assert(rgb.forall(_ == 77.toByte))
  }

  test("JPEG progressive color: interleaved-DC scans decode identically to baseline 4:4:4") {
    // three distinct full-resolution YCbCr planes exercise the interleaved
    // DC walk (per-component predictors within one MCU stream) and the
    // per-component AC scans against the same baseline-equality truth
    for ((w, h, quant) <- Seq((16, 16, 8), (24, 13, 2), (8, 40, 4))) {
      def plane(f: (Int, Int) => Int) =
        Array.tabulate[Byte](w * h)(i => f(i % w, i / w).toByte)
      val yP = plane((x, y) => (x * 5 + y * 11) % 256)
      val cb = plane((x, y) => (128 + x * 3 - y * 7) % 256)
      val cr = plane((x, y) => (128 + (x * y) % 53) % 256)
      val base = MediaCodecs.encodeJpegYcbcr444(w, h, yP, cb, cr, quant)
      val prog = MediaCodecs.encodeJpegYcbcr444Progressive(w, h, yP, cb, cr, quant)
      val Some((bw, bh, bRgb)) = MediaCodecs.parseJpegPixels(base)
      val Some((pw, ph, pRgb)) = MediaCodecs.parseJpegPixels(prog)
      assert((bw, bh) == (w, h) && (pw, ph) == (w, h))
      assert(pRgb.sameElements(bRgb), s"color progressive != baseline at ${w}x$h q=$quant")
    }
    // hostile fuzz over a color progressive stream never throws
    val p = MediaCodecs.encodeJpegYcbcr444Progressive(16, 8,
      new Array[Byte](128), Array.fill[Byte](128)(100.toByte),
      Array.fill[Byte](128)(200.toByte), 8)
    for (i <- p.indices) {
      val bad = p.clone; bad(i) = (bad(i) ^ 0xa7).toByte
      MediaCodecs.parseJpegPixels(bad)
    }
  }

  test("JPEG progressive 4:2:0: subsampled scans decode identically to baseline") {
    // the asymmetry under test: interleaved DC scans cover the PADDED MCU
    // grid (4 luma + 1 Cb + 1 Cr blocks per MCU) while per-component AC
    // scans cover only each component's UNPADDED block grid — odd dims
    // force partial edge blocks AND luma/chroma grids that disagree
    for ((w, h, quant) <- Seq((16, 16, 8), (22, 18, 4), (17, 9, 2))) {
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val yP = Array.tabulate[Byte](w * h)(i => ((i % w) * 5 + (i / w) * 11).toByte)
      val cb = Array.tabulate[Byte](cw * ch)(i => (128 + (i % cw) * 3 - (i / cw) * 7).toByte)
      val cr = Array.tabulate[Byte](cw * ch)(i => (128 + ((i % cw) * (i / cw)) % 53).toByte)
      val base = MediaCodecs.encodeJpegYcbcr420(w, h, yP, cb, cr, quant)
      val prog = MediaCodecs.encodeJpegYcbcr420Progressive(w, h, yP, cb, cr, quant)
      val Some((bw, bh, bRgb)) = MediaCodecs.parseJpegPixels(base)
      val Some((pw, ph, pRgb)) = MediaCodecs.parseJpegPixels(prog)
      assert((bw, bh) == (w, h) && (pw, ph) == (w, h))
      assert(pRgb.sameElements(bRgb), s"4:2:0 progressive != baseline at ${w}x$h q=$quant")
    }
  }

  test("AVI/MJPG: hand-checked RIFF header layout") {
    // spec-derived golden prefix, independent of the parser: RIFF size is
    // total-8 LE, form type 'AVI ', first list is hdrl whose first chunk
    // is a 56-byte avih carrying micros-per-frame and dims at documented
    // offsets
    val f = Seq(MediaCodecs.encodeJpegGray(8, 8, new Array[Byte](64), quant = 8))
    val avi = MediaCodecs.encodeAviMjpeg(320, 240, 25, f)
    def tag(i: Int) = new String(avi, i, 4, "US-ASCII")
    def u32(i: Int) = (avi(i) & 0xffL) | ((avi(i + 1) & 0xffL) << 8) |
      ((avi(i + 2) & 0xffL) << 16) | ((avi(i + 3) & 0xffL) << 24)
    assert(tag(0) == "RIFF" && u32(4) == avi.length - 8 && tag(8) == "AVI ")
    assert(tag(12) == "LIST" && tag(20) == "hdrl")
    assert(tag(24) == "avih" && u32(28) == 56)
    assert(u32(32) == 40000)                  // 1e6 / 25 fps
    assert(u32(64) == 320 && u32(68) == 240)  // dwWidth / dwHeight
  }

  test("AVI/MJPG: container roundtrip preserves every frame byte; hostile bytes reject") {
    val f = (0 until 5).map { i =>
      MediaCodecs.encodeJpegGray(16, 8, Array.fill[Byte](128)((i * 11).toByte), quant = 8)
    }
    val avi = MediaCodecs.encodeAviMjpeg(16, 8, 25, f)
    val Some((w, h, fps, frames)) = MediaCodecs.parseAviMjpegFrames(avi)
    assert((w, h, fps) == (16, 8, 25))
    assert(frames.length == 5)
    frames.zip(f).foreach { case (got, want) => assert(got.sameElements(want)) }
    // every sampled frame still raster-decodes
    frames.foreach(fr => assert(MediaCodecs.parseJpegPixels(fr).isDefined))
    // hostile: junk, prose, truncations, a WAV (RIFF but not AVI), and a
    // stream whose handler is not MJPG
    assert(MediaCodecs.parseAviMjpegFrames(Array.tabulate[Byte](64)(i => (i * 7).toByte)).isEmpty)
    assert(MediaCodecs.parseAviMjpegFrames("RIFF but prose".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.parseAviMjpegFrames(MediaCodecs.encodeWav(8000, 1, 16, 4)).isEmpty)
    (0 until avi.length by 7).foreach(n =>
      MediaCodecs.parseAviMjpegFrames(avi.take(n))) // never throws
    val notMjpg = avi.clone
    val hIdx = (0 until avi.length - 4).find(i => new String(avi, i, 4, "US-ASCII") == "MJPG").get
    notMjpg(hIdx) = 'H'.toByte
    assert(MediaCodecs.parseAviMjpegFrames(notMjpg).isEmpty)
  }

  test("AVI/MJPG: idx1 is present and schedules every frame chunk") {
    val f = (0 until 3).map { i =>
      MediaCodecs.encodeJpegGray(8, 8, Array.fill[Byte](64)((i * 5).toByte), quant = 8)
    }
    val avi = MediaCodecs.encodeAviMjpeg(8, 8, 25, f)
    def tag(i: Int) = new String(avi, i, 4, "US-ASCII")
    def u32(i: Int) = (avi(i) & 0xffL) | ((avi(i + 1) & 0xffL) << 8) |
      ((avi(i + 2) & 0xffL) << 16) | ((avi(i + 3) & 0xffL) << 24)
    // avih sets AVIF_HASINDEX (0x10), so the idx1 chunk must exist
    assert((u32(44) & 0x10L) == 0x10L)
    val ix = (0 until avi.length - 4).find(i => tag(i) == "idx1").get
    assert(u32(ix + 4) == 16L * f.length) // one 16-byte entry per frame
    // every entry: '00dc', AVIIF_KEYFRAME, and an offset (relative to the
    // 'movi' list-type bytes) that lands exactly on that frame's chunk
    val movi = (0 until avi.length - 4).find(i => tag(i) == "movi").get
    (0 until f.length).foreach { e =>
      val en = ix + 8 + 16 * e
      assert(tag(en) == "00dc" && u32(en + 4) == 0x10L)
      val chunkAt = movi + u32(en + 8).toInt
      assert(tag(chunkAt) == "00dc" && u32(chunkAt + 4) == f(e).length.toLong)
    }
  }

  test("MP4/MJPEG: sample-table roundtrip across chunkings; frames decode") {
    // 7 frames at samplesPerChunk=3 -> chunks of 3/3/1 and the two-entry
    // stsc walk; 6 frames -> the single-entry form; 2 frames -> one short
    // chunk. Frame bytes differ per index so a scheduling slip (wrong
    // chunk, wrong intra-chunk offset) breaks byte equality, not just size.
    for ((n, spc) <- Seq((7, 3), (6, 3), (2, 3), (5, 1))) {
      val f = (0 until n).map { i =>
        MediaCodecs.encodeJpegGray(16, 8, Array.fill[Byte](128)((i * 11 + 3).toByte), quant = 8)
      }
      val mp4 = MediaCodecs.encodeMp4Mjpeg(16, 8, 1000, 40, f, samplesPerChunk = spc)
      val s = MediaCodecs.parseMp4Samples(mp4).getOrElse(fail(s"n=$n spc=$spc did not parse"))
      assert((s.width, s.height, s.timescale, s.sampleDelta) == (16, 8, 1000, 40))
      assert(s.frames.length == n)
      s.frames.zip(f).foreach { case (got, want) => assert(got.sameElements(want)) }
      s.frames.foreach(fr => assert(MediaCodecs.parseJpegPixels(fr).isDefined))
      // the metadata-only parser agrees on the movie header
      val meta = MediaCodecs.parseMp4(mp4).get
      assert(meta.timescale == 1000 && meta.duration == n.toLong * 40)
      // co64 (the 64-bit chunk-offset table large files carry): identical
      // frames through the widened-offset path, and the stco path is
      // really gone from the container
      val big = MediaCodecs.encodeMp4Mjpeg(16, 8, 1000, 40, f,
        samplesPerChunk = spc, use64BitOffsets = true)
      def tag4(bb: Array[Byte], i: Int) = new String(bb, i, 4, "US-ASCII")
      assert((0 until big.length - 4).exists(i => tag4(big, i) == "co64") &&
        !(0 until big.length - 4).exists(i => tag4(big, i) == "stco"))
      val sb = MediaCodecs.parseMp4Samples(big)
        .getOrElse(fail(s"co64 n=$n spc=$spc did not parse"))
      assert(sb.frames.length == n)
      sb.frames.zip(f).foreach { case (got, want) => assert(got.sameElements(want)) }
      // hostile: a co64 offset with the sign bit set rejects cleanly
      val co64At = (0 until big.length - 4).find(i => tag4(big, i) == "co64").get
      val evil = big.clone
      evil(co64At + 12) = 0x80.toByte // first offset's top byte
      assert(MediaCodecs.parseMp4Samples(evil).isEmpty)
      (0 until big.length by 7).foreach { i =>
        val c = big.clone; c(i) = (c(i) ^ 0x5a).toByte
        MediaCodecs.parseMp4Samples(c) // never throws
      }
    }
  }

  test("MP4/MJPEG: hand-checked box layout") {
    val f = Seq(MediaCodecs.encodeJpegGray(8, 8, new Array[Byte](64), quant = 8))
    val mp4 = MediaCodecs.encodeMp4Mjpeg(8, 8, 600, 20, f)
    def tag(i: Int) = new String(mp4, i, 4, "US-ASCII")
    def u32(i: Int) = ((mp4(i) & 0xffL) << 24) | ((mp4(i + 1) & 0xffL) << 16) |
      ((mp4(i + 2) & 0xffL) << 8) | (mp4(i + 3) & 0xffL)
    assert(u32(0) == 16 && tag(4) == "ftyp" && tag(8) == "isom")
    assert(tag(20) == "mdat" && u32(16) == 8 + f.head.length)
    // mdat payload starts at 24 and is the frame verbatim — the offset
    // stco must carry for chunk 1
    assert(mp4.slice(24, 24 + f.head.length).sameElements(f.head))
    val moovAt = 16 + 8 + f.head.length
    assert(tag(moovAt + 4) == "moov" && u32(moovAt) == mp4.length - moovAt)
    val stcoAt = (0 until mp4.length - 4).find(i => tag(i) == "stco").get
    assert(u32(stcoAt + 8) == 1 && u32(stcoAt + 12) == 24)
    // a 64-bit LARGESIZE top-level box (the > 4 GiB mdat form) between
    // mdat and moov must be skipped, not rejected: size32 == 1 with the
    // real u64 size after the tag. Inserted after mdat so no stco offset
    // shifts; the walker previously rejected any largesize box outright.
    val largeFree = java.nio.ByteBuffer.allocate(24)
      .putInt(1).put("free".getBytes("US-ASCII")).putLong(24L)
      .put(Array.fill[Byte](8)(0x5a)).array()
    val withFree = mp4.slice(0, moovAt) ++ largeFree ++ mp4.drop(moovAt)
    val sLarge = MediaCodecs.parseMp4Samples(withFree)
      .getOrElse(fail("largesize free box rejected"))
    assert(sLarge.frames.length == 1 && sLarge.frames.head.sameElements(f.head))
    // hostile: a largesize claiming less than its own header rejects, and
    // single-byte fuzz over the largesize container never throws
    val evil = withFree.clone
    evil(moovAt + 15) = 8 // u64 size -> 8 (< 16)
    assert(MediaCodecs.parseMp4Samples(evil).isEmpty)
    (0 until withFree.length).foreach { i =>
      val c = withFree.clone; c(i) = (c(i) ^ 0x5a).toByte
      MediaCodecs.parseMp4Samples(c)
    }
  }

  test("MP4/MJPEG: hostile bytes, truncation, and table bombs reject without throwing") {
    val f = (0 until 4).map(i =>
      MediaCodecs.encodeJpegGray(8, 8, Array.fill[Byte](64)(i.toByte), quant = 8))
    val mp4 = MediaCodecs.encodeMp4Mjpeg(8, 8, 1000, 40, f)
    assert(MediaCodecs.parseMp4Samples(mp4).isDefined)
    // junk, prose, an AVI, a header-only MP4 (no tracks), truncations
    assert(MediaCodecs.parseMp4Samples(Array.tabulate[Byte](64)(i => (i * 7).toByte)).isEmpty)
    assert(MediaCodecs.parseMp4Samples("ftyp but prose everywhere".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.parseMp4Samples(MediaCodecs.encodeAviMjpeg(8, 8, 25, f)).isEmpty)
    assert(MediaCodecs.parseMp4Samples(MediaCodecs.encodeMp4(1000, 40)).isEmpty)
    (0 until mp4.length by 5).foreach(n =>
      MediaCodecs.parseMp4Samples(mp4.take(n))) // never throws
    def tag(i: Int) = new String(mp4, i, 4, "US-ASCII")
    def patch(at: Int, bytes: Array[Byte]): Array[Byte] = {
      val c = mp4.clone; System.arraycopy(bytes, 0, c, at, bytes.length); c
    }
    // a non-'jpeg' sample entry is not decodable here -> reject
    val stsdAt = (0 until mp4.length - 4).find(i => tag(i) == "stsd").get
    assert(MediaCodecs.parseMp4Samples(
      patch(stsdAt + 16, "avc1".getBytes("US-ASCII"))).isEmpty)
    // stsz sample-count bomb must reject before allocating
    val stszAt = (0 until mp4.length - 4).find(i => tag(i) == "stsz").get
    assert(MediaCodecs.parseMp4Samples(
      patch(stszAt + 12, Array(0x7f, 0xff, 0xff, 0xff).map(_.toByte))).isEmpty)
    // a chunk offset pointing past EOF rejects the whole container
    val stcoAt = (0 until mp4.length - 4).find(i => tag(i) == "stco").get
    assert(MediaCodecs.parseMp4Samples(
      patch(stcoAt + 12, Array(0x7f, 0xff, 0xff, 0xff).map(_.toByte))).isEmpty)
    // a 32-bit box size near Int.MaxValue at a non-zero offset must not
    // wrap the `i + size` bound check negative (Int overflow) — it rejects
    // cleanly via long math at every walk depth (top level, moov children,
    // stbl children), for both the sample walker and the meta probe
    val moovAt2 = (0 until mp4.length - 4).find(i => tag(i) == "moov").get
    val trakAt = (0 until mp4.length - 4).find(i => tag(i) == "trak").get
    val big = Array(0x7f, 0xff, 0xff, 0xff).map(_.toByte)
    Seq(moovAt2, trakAt, stcoAt, stszAt).foreach { tagAt =>
      val c = patch(tagAt - 4, big) // the u32 size field precedes the tag
      assert(MediaCodecs.parseMp4Samples(c).isEmpty) // never throws
      MediaCodecs.parseMp4(c)                        // meta probe never throws
    }
    // single-byte fuzz across the whole container must never throw
    (0 until mp4.length).foreach { i =>
      val c = mp4.clone; c(i) = (c(i) ^ 0x5a).toByte
      MediaCodecs.parseMp4Samples(c)
    }
  }

  test("fMP4/MJPEG: fragment walk roundtrip across fragmentations; hostile bytes reject") {
    // frame bytes differ per global index so a scheduling slip (wrong
    // fragment, wrong data_offset, wrong intra-mdat offset) breaks byte
    // equality; fragmentations cover 1 fragment, even splits, and a tail
    for (split <- Seq(Seq(7), Seq(3, 4), Seq(2, 2, 2, 1))) {
      val all = (0 until split.sum).map { i =>
        MediaCodecs.encodeJpegGray(16, 8, Array.fill[Byte](128)((i * 13 + 5).toByte), quant = 8)
      }
      val frags = split.foldLeft((Seq.empty[Seq[Array[Byte]]], all.toSeq)) {
        case ((acc, rest), c) => (acc :+ rest.take(c), rest.drop(c))
      }._1
      val mp4 = MediaCodecs.encodeMp4FragMjpeg(16, 8, 1000, 40, frags)
      val s = MediaCodecs.parseMp4FragSamples(mp4)
        .getOrElse(fail(s"split=$split did not parse"))
      assert((s.width, s.height, s.timescale, s.sampleDelta) == (16, 8, 1000, 40))
      assert(s.frames.length == all.length)
      s.frames.zip(all).foreach { case (got, want) => assert(got.sameElements(want)) }
      s.frames.foreach(fr => assert(MediaCodecs.parseJpegPixels(fr).isDefined))
      // the unfragmented walk must NOT parse a fragmented file (empty
      // sample tables), and vice versa
      assert(MediaCodecs.parseMp4Samples(mp4).isEmpty)
    }
    val plain = MediaCodecs.encodeMp4Mjpeg(16, 8, 1000, 40,
      Seq(MediaCodecs.encodeJpegGray(16, 8, new Array[Byte](128), quant = 8)))
    assert(MediaCodecs.parseMp4FragSamples(plain).isEmpty)
    // hostile: junk, truncations, and single-byte fuzz never throw
    val good = MediaCodecs.encodeMp4FragMjpeg(16, 8, 1000, 40, Seq(
      (0 until 3).map(i => MediaCodecs.encodeJpegGray(16, 8,
        Array.fill[Byte](128)(i.toByte), quant = 8))))
    assert(MediaCodecs.parseMp4FragSamples(
      Array.tabulate[Byte](64)(i => (i * 7).toByte)).isEmpty)
    (0 until good.length by 5).foreach(n =>
      MediaCodecs.parseMp4FragSamples(good.take(n)))
    (0 until good.length).foreach { i =>
      val c = good.clone; c(i) = (c(i) ^ 0x5a).toByte
      MediaCodecs.parseMp4FragSamples(c)
    }
    // a trun sample-count bomb rejects before allocating
    def tag4(bb: Array[Byte], i: Int) = new String(bb, i, 4, "US-ASCII")
    val trunAt = (0 until good.length - 4).find(i => tag4(good, i) == "trun").get
    val bomb = good.clone
    bomb(trunAt + 8) = 0x7f.toByte
    assert(MediaCodecs.parseMp4FragSamples(bomb).isEmpty)
    // a near-Int.MaxValue box size inside the traf walk (and at top level)
    // must reject via long math, not wrap negative and throw
    val big7f = Array(0x7f, 0xff, 0xff, 0xff).map(_.toByte)
    Seq("trun", "tfhd", "traf", "moof").foreach { t =>
      val at = (0 until good.length - 4).find(i => tag4(good, i) == t).get
      val c = good.clone; System.arraycopy(big7f, 0, c, at - 4, 4)
      assert(MediaCodecs.parseMp4FragSamples(c).isEmpty) // never throws
    }
    // MULTI-TRUN fragments (several runs per traf — the multi-GOP DASH
    // shape): 5 samples split 2/2/1 across truns within ONE fragment must
    // roundtrip byte-identically, and the multi-trun stream must carry
    // more trun boxes than the single-trun encoding of the same frames
    val mf = (0 until 5).map(i =>
      MediaCodecs.encodeJpegGray(8, 8, Array.fill[Byte](64)((i * 9 + 1).toByte), quant = 8))
    val multi = MediaCodecs.encodeMp4FragMjpeg(8, 8, 1000, 40, Seq(mf),
      samplesPerTrun = 2)
    def countTag(bb: Array[Byte], t: String) =
      (0 until bb.length - 4).count(i => tag4(bb, i) == t)
    assert(countTag(multi, "trun") == 3)
    val sm = MediaCodecs.parseMp4FragSamples(multi).getOrElse(fail("multi-trun did not parse"))
    assert(sm.frames.length == 5)
    sm.frames.zip(mf).foreach { case (got, want) => assert(got.sameElements(want)) }
    (0 until multi.length).foreach { i =>
      val c = multi.clone; c(i) = (c(i) ^ 0x33).toByte
      MediaCodecs.parseMp4FragSamples(c) // never throws
    }
    // MUXED two-track segments (the common DASH shape): audio is track 1
    // with its trak, trex, and per-moof traf all FIRST; the walker must
    // select the video track by tkhd/tfhd track_id, skip the audio truns,
    // and still resolve every frame byte-identically — a first-trak or
    // first-traf walk reads audio bytes as frames and fails byte equality
    for (split <- Seq(Seq(5), Seq(2, 3))) {
      val all = (0 until split.sum).map { i =>
        MediaCodecs.encodeJpegGray(8, 8, Array.fill[Byte](64)((i * 11 + 3).toByte), quant = 8)
      }
      val frags = split.foldLeft((Seq.empty[Seq[Array[Byte]]], all.toSeq)) {
        case ((acc, rest), c) => (acc :+ rest.take(c), rest.drop(c))
      }._1
      val muxed = MediaCodecs.encodeMp4FragMjpeg(8, 8, 1000, 40, frags,
        muxAudio = true)
      // the fixture really is muxed: two traks, two trexes, and one traf
      // per track per moof
      assert(countTag(muxed, "trak") == 2 && countTag(muxed, "trex") == 2)
      assert(countTag(muxed, "traf") == 2 * split.length)
      assert(countTag(muxed, "soun") >= 1)
      val ms = MediaCodecs.parseMp4FragSamples(muxed)
        .getOrElse(fail(s"muxed split=$split did not parse"))
      assert((ms.width, ms.height, ms.timescale, ms.sampleDelta) == (8, 8, 1000, 40))
      assert(ms.frames.length == all.length)
      ms.frames.zip(all).foreach { case (got, want) => assert(got.sameElements(want)) }
      ms.frames.foreach(fr => assert(MediaCodecs.parseJpegPixels(fr).isDefined))
      // hostile single-byte fuzz on the muxed layout never throws
      (0 until muxed.length).foreach { i =>
        val c = muxed.clone; c(i) = (c(i) ^ 0x5a).toByte
        MediaCodecs.parseMp4FragSamples(c)
      }
    }
    // multi-trun AND muxed at once (several video runs behind an audio traf)
    val mx = MediaCodecs.encodeMp4FragMjpeg(8, 8, 1000, 40, Seq(mf),
      samplesPerTrun = 2, muxAudio = true)
    val mxs = MediaCodecs.parseMp4FragSamples(mx).getOrElse(fail("muxed multi-trun"))
    assert(mxs.frames.length == 5)
    mxs.frames.zip(mf).foreach { case (got, want) => assert(got.sameElements(want)) }
  }

  test("garbage, truncation, and BM-prefixed text do not parse") {
    assert(MediaCodecs.parseMeta(Array.empty[Byte]).isEmpty)
    assert(MediaCodecs.parseMeta("plain text payload".getBytes("UTF-8")).isEmpty)
    // text starting with the BMP magic must fail the DIB/planes/bpp checks
    assert(MediaCodecs.parseMeta(
      "BMW makes cars, not bitmaps, and this is prose.".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.parseMeta(goldenPng.take(20)).isEmpty)
    assert(MediaCodecs.parseMeta(goldenBmp.take(20)).isEmpty)
    // PNG signature with a non-IHDR first chunk is rejected
    val wrongChunk = goldenPng.clone
    wrongChunk(12) = 'J'.toByte
    assert(MediaCodecs.parseMeta(wrongChunk).isEmpty)
    // zero/negative dims are rejected
    val zeroW = goldenPng.clone
    zeroW(19) = 0x00
    assert(MediaCodecs.parseMeta(zeroW).isEmpty)
  }
}
