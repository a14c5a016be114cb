package graft

import graft.multimodal.MediaCodecs
import graft.multimodal.Multimodal.MediaMeta
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
