package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import graft.multimodal.Multimodal.MediaMeta

/** Real byte-level image-header codecs — pure JVM, no image libraries.
  *
  * [[parseMeta]] recognizes PNG (8-byte signature + IHDR chunk, RFC 2083 §3)
  * and BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, LE) payloads and reads
  * width/height/depth from their documented byte offsets; anything else
  * returns None so callers can fall back to a stub or raise. The encoders
  * exist for fixtures and the oracle roundtrip: they emit spec-conformant
  * header bytes (PNG CRC32 included) that any external tool would accept,
  * so the parser is exercised against real byte layouts, not a mirror of
  * its own assumptions — MediaCodecsSpec additionally pins hand-written
  * golden byte arrays independent of the encoders.
  */
object MediaCodecs {

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG header length: 8 signature + IHDR chunk (4 len + 4 type + 13 data + 4 crc). */
  val PngHeaderLen = 33
  /** BMP header length: 14 file header + 40 BITMAPINFOHEADER. */
  val BmpHeaderLen = 54

  /** Parse image metadata from the leading bytes of a payload. n_frames is 1
    * for both stills (APNG/multi-frame formats are out of scope). Returns
    * None for unrecognized or truncated/corrupt headers — never throws on
    * arbitrary bytes (executors see whatever the corpus carries).
    */
  def parseMeta(bytes: Array[Byte]): Option[MediaMeta] =
    parsePng(bytes).orElse(parseBmp(bytes))

  private def parsePng(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 26) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    // first chunk must be IHDR: length(4 BE) type(4) width(4 BE) height(4 BE)
    // bit-depth(1) color-type(1) ...
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
    val w = buf.getInt(16)
    val h = buf.getInt(20)
    if (w <= 0 || h <= 0) return None
    Some(MediaMeta(w, h, 1, "png"))
  }

  // BITMAPINFOHEADER and its documented successors; arbitrary text that
  // happens to start with "BM" puts ASCII garbage here, so the whitelist
  // (plus planes/bpp below) keeps the magic check from false-positives on
  // non-image payloads.
  private val DibSizes = Set(40, 52, 56, 64, 108, 124)
  private val BmpBpp = Set(1, 4, 8, 16, 24, 32)

  private def parseBmp(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 30 || b(0) != 'B' || b(1) != 'M') return None
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    if (!DibSizes.contains(buf.getInt(14))) return None
    if (buf.getShort(26) != 1) return None // color planes is always 1
    if (!BmpBpp.contains(buf.getShort(28).toInt)) return None
    val w = buf.getInt(18)
    val h = buf.getInt(22) // negative = top-down row order; magnitude is the height
    if (w <= 0 || h == 0) return None
    Some(MediaMeta(w, math.abs(h), 1, "bmp"))
  }

  /** Spec-conformant PNG signature + IHDR chunk (CRC32 over type+data, as
    * the spec requires). `colorType` 2 = truecolor.
    */
  def encodePng(width: Int, height: Int, bitDepth: Int = 8, colorType: Int = 2): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive ($width x $height)")
    val buf = ByteBuffer.allocate(PngHeaderLen).order(ByteOrder.BIG_ENDIAN)
    buf.put(PngSig)
    buf.putInt(13) // IHDR data length
    val crcStart = buf.position()
    buf.put("IHDR".getBytes("US-ASCII"))
    buf.putInt(width).putInt(height)
    buf.put(bitDepth.toByte).put(colorType.toByte)
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
    val crc = new CRC32
    crc.update(buf.array(), crcStart, 4 + 13)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** BITMAPFILEHEADER + BITMAPINFOHEADER for an uncompressed BMP with no
    * pixel payload (header-only fixture; the file size and data offset
    * fields are filled in as the spec defines them).
    */
  def encodeBmp(width: Int, height: Int, bitsPerPixel: Int = 24): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive ($width x $height)")
    val buf = ByteBuffer.allocate(BmpHeaderLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(BmpHeaderLen)       // file size (no pixel data)
    buf.putInt(0)                  // reserved
    buf.putInt(BmpHeaderLen)       // pixel data offset
    buf.putInt(40)                 // BITMAPINFOHEADER size
    buf.putInt(width).putInt(height)
    buf.putShort(1)                // planes
    buf.putShort(bitsPerPixel.toShort)
    // compression, image size, ppm resolutions, palette counts: 6 x int32 = 0
    buf.array()
  }
}
