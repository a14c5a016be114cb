package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) crawl-container source — the ingest step upstream of
  * the HTML extraction family (functions/HtmlFns): a crawl ships as .warc.gz
  * files of gzip members, one WARC record per member, each record a header
  * block + payload (for `response` records, an HTTP message whose body is
  * the HTML).
  *
  * This is the reference's glob+gz feed discipline
  * (modules/data_analyzer.py:57-74) generalized to the crawl case: the
  * byte-level record codec runs INSIDE executors (flatMap over file bytes —
  * justified imperative per-partition work, like multimodal/MediaCodecs),
  * and malformed records land in a rejects side-channel instead of failing
  * the job (the S6 quarantine discipline, modules/data_loader.py:203-228).
  *
  * Scale: one task per WARC file (crawls ship millions of ~1 GB files — the
  * natural parallel unit); the parse is single-pass streaming over the
  * decompressed bytes, memory bounded by one record. Java's GZIPInputStream
  * reads concatenated members natively, so per-record members and
  * whole-file compression both parse. The encoders exist for fixtures and
  * tests — spec-conformant bytes (header block, CRLF framing, HTTP
  * payload, per-record gzip members) that any WARC tool would accept.
  */
object Warc {

  /** One parsed record. `body` is the HTTP message body for response
    * records (the HTML), the raw payload otherwise. `rejectReason` is null
    * for well-formed records — quarantine on it (Sources.quarantine shape).
    *
    * `offset` is ALWAYS in the DECOMPRESSED-stream domain (bytes into the
    * gunzipped record stream, or into the file itself when it is not
    * gzipped) — including on reject rows, where it marks how far the parser
    * got. The one place a compressed-domain position exists — a corrupt
    * gzip member — is carried INSIDE the reject reason text, explicitly
    * labeled "at compressed offset N", never in this column; triage against
    * the on-disk file should use the reason's compressed offset, and triage
    * against a gunzipped copy should use this column.
    */
  final case class WarcRow(
      file: String, offset: Long, warc_type: String, record_id: String,
      target_uri: String, warc_date: String, http_status: Int,
      content_type: String, body: String, reject_reason: String)

  // ---------------------------------------------------------------- encode

  /** Serialize one WARC response record (uncompressed): WARC header block,
    * HTTP response payload, trailing CRLF CRLF record separator.
    */
  def encodeResponse(recordId: String, targetUri: String, date: String,
                     html: String, status: Int = 200): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    val http = (s"HTTP/1.1 $status OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    val payloadLen = http.length + body.length
    val header = (s"WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recordId>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $targetUri\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: $payloadLen\r\n\r\n").getBytes(UTF_8)
    val out = new ByteArrayOutputStream(header.length + payloadLen + 4)
    out.write(header); out.write(http); out.write(body)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** One gzip member wrapping one record — the standard .warc.gz framing. */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  /** A .warc.gz file: concatenated per-record gzip members. */
  def warcGzFile(records: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    records.foreach(r => bos.write(gzipMember(r)))
    bos.toByteArray
  }

  // ----------------------------------------------------------------- parse

  /** Decompress MEMBER BY MEMBER (not with one multi-member
    * GZIPInputStream): Java's reader silently treats an unreadable next
    * member header as end-of-stream — a corrupt member mid-file would make
    * every later record VANISH with no reject row — and a deflate error
    * anywhere would discard the good members already decompressed. Each
    * member's RFC 1952 header is parsed directly (fixed 10 bytes plus the
    * optional FEXTRA/FNAME/FCOMMENT/FHCRC fields) and its body inflated
    * with a raw Inflater, so byte accounting is exact and a bad member
    * salvages everything before it while quarantining the rest (the next
    * member boundary after corrupt deflate data is unrecoverable — gzip
    * members carry no length field).
    *
    * @return (decompressed bytes of the good prefix, error description of
    *         the first bad member or null)
    */
  private def gunzipMembers(bytes: Array[Byte]): (Array[Byte], String) = {
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](8192)
    var off = 0
    while (off < bytes.length) {
      def fail(msg: String): (Array[Byte], String) =
        (out.toByteArray, s"$msg at compressed offset $off (remaining bytes skipped)")
      // ---- RFC 1952 member header
      if (off + 10 > bytes.length ||
          bytes(off) != GzMagic(0) || bytes(off + 1) != GzMagic(1))
        return fail("not a gzip member")
      if (bytes(off + 2) != 8) return fail("unsupported gzip compression method")
      val flg = bytes(off + 3) & 0xff
      var p = off + 10
      if ((flg & 0x04) != 0) {              // FEXTRA: u16 LE length + data
        if (p + 2 > bytes.length) return fail("truncated gzip FEXTRA")
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 0x08) != 0) {              // FNAME: zero-terminated
        while (p < bytes.length && bytes(p) != 0) p += 1
        p += 1
      }
      if ((flg & 0x10) != 0) {              // FCOMMENT: zero-terminated
        while (p < bytes.length && bytes(p) != 0) p += 1
        p += 1
      }
      if ((flg & 0x02) != 0) p += 2         // FHCRC
      if (p > bytes.length) return fail("truncated gzip header")
      // ---- raw deflate body
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, p, bytes.length - p)
        val crc = new CRC32
        var isize = 0L
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException =>
              return fail("corrupt gzip member")
            }
          if (n == 0 && !inf.finished()) return fail("truncated gzip member")
          crc.update(buf, 0, n)
          isize += n
          out.write(buf, 0, n)
        }
        val used = (bytes.length - p) - inf.getRemaining
        val trailerAt = p + used
        if (trailerAt + 8 > bytes.length) return fail("truncated gzip trailer")
        def u32(i: Int): Long =
          (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
        if (u32(trailerAt) != crc.getValue) return fail("gzip member CRC mismatch")
        if (u32(trailerAt + 4) != (isize & 0xffffffffL))
          return fail("gzip member length mismatch")
        off = trailerAt + 8
      } finally inf.end()
    }
    (out.toByteArray, null)
  }

  private val GzMagic = Array[Byte](0x1f, 0x8b.toByte)

  /** Parse a whole WARC file (gzipped — multi-member or whole-file — or
    * plain). Well-formed records come back with `reject_reason = null`;
    * malformed ones as quarantine rows. A record whose Content-Length is
    * unreadable makes the REMAINING bytes unparseable (framing is length-
    * delimited), so that tail is one reject row — never an exception:
    * executors see whatever the crawl wrote. A corrupt gzip member
    * likewise quarantines the file's TAIL while every record from earlier
    * members survives.
    */
  def parseFile(file: String, raw: Array[Byte]): Seq[WarcRow] = {
    var gzError: String = null
    val bytes =
      if (raw.length >= 2 && raw(0) == GzMagic(0) && raw(1) == GzMagic(1)) {
        val (b, err) = gunzipMembers(raw)
        gzError = err
        b
      } else raw
    val out = Seq.newBuilder[WarcRow]
    var off = 0
    while (off < bytes.length) {
      // skip inter-record CRLFs
      while (off < bytes.length && (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
      if (off < bytes.length) {
        parseRecord(file, bytes, off) match {
          case Right((row, next)) => out += row; off = next
          case Left(row) => out += row; off = bytes.length // unframed tail
        }
      }
    }
    // a bad gzip member quarantines the file's compressed tail — records
    // from the good members above still stand
    if (gzError != null) out += reject(file, bytes.length, gzError)
    out.result()
  }

  private def reject(file: String, offset: Long, reason: String): WarcRow =
    WarcRow(file, offset, null, null, null, null, -1, null, null, reason)

  /** One record at `start`: Right((row, nextOffset)) when the length
    * framing held (the row itself may still be a reject), Left(reject)
    * when it didn't and the rest of the file is unrecoverable.
    */
  private def parseRecord(file: String, b: Array[Byte],
                          start: Int): Either[WarcRow, (WarcRow, Int)] = {
    val headEnd = indexOfBlankLine(b, start)
    if (headEnd < 0)
      return Left(reject(file, start, "no header terminator in remaining bytes"))
    val head = new String(b, start, headEnd - start, UTF_8)
    val lines = head.split("\r\n")
    if (!lines(0).startsWith("WARC/"))
      return Left(reject(file, start, s"not a WARC version line: '${lines(0).take(40)}'"))
    val headers = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val lenOpt = headers.get("content-length").flatMap(_.toLongOption)
    if (lenOpt.isEmpty)
      return Left(reject(file, start, "missing or malformed Content-Length"))
    val len = lenOpt.get
    val payloadStart = headEnd + 4
    if (len < 0 || payloadStart + len > b.length)
      return Left(reject(file, start, s"Content-Length $len overruns file"))
    val next = (payloadStart + len).toInt
    val warcType = headers.getOrElse("warc-type", "")
    val ctype = headers.getOrElse("content-type", "")
    if (warcType.isEmpty)
      return Right((reject(file, start, "missing WARC-Type"), next))
    val payload = new String(b, payloadStart, len.toInt, UTF_8)
    // response records carry an HTTP message: status line + headers, blank
    // line, body
    val (status, body) =
      if (warcType == "response" && ctype.startsWith("application/http")) {
        val split = payload.indexOf("\r\n\r\n")
        if (split < 0) return Right((reject(file, start, "HTTP payload has no header/body split"), next))
        val statusLine = payload.substring(0, payload.indexOf("\r\n") max 0)
        val st = statusLine.split(" ")
        val code = if (st.length >= 2) st(1).toIntOption.getOrElse(-1) else -1
        if (code < 0) return Right((reject(file, start, s"bad HTTP status line: '${statusLine.take(40)}'"), next))
        (code, payload.substring(split + 4))
      } else (0, payload)
    Right((WarcRow(file, start, warcType,
      headers.getOrElse("warc-record-id", ""),
      headers.getOrElse("warc-target-uri", ""),
      headers.getOrElse("warc-date", ""),
      status, ctype, body, null), next))
  }

  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // ----------------------------------------------------------------- spark

  /** Parse a Dataset of (file, bytes) into record rows + quarantine rows in
    * one pass — split with `Sources.quarantine(df, col("reject_reason").isNull)`.
    * flatMap keeps the codec in executors; one input row (file) per task
    * unit, memory bounded by one decompressed file (crawl files are sized
    * for exactly this — set maxPartitionBytes accordingly on a cluster).
    */
  def records(files: Dataset[(String, Array[Byte])]): DataFrame = {
    import files.sparkSession.implicits._
    files.flatMap { case (name, bytes) => parseFile(name, bytes) }.toDF()
  }

  /** Glob a directory of .warc.gz files through Spark's binaryFile source
    * (distributed listing + read, like every other source here) and parse.
    */
  def read(spark: org.apache.spark.sql.SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    records(spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])])
  }
}
