package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import java.nio.charset.StandardCharsets.UTF_8

  private def resp(id: Long, html: String): Array[Byte] =
    Warc.encodeResponse(f"doc-$id%08d", s"http://crawl.test/doc/$id",
      "2024-01-01T00:00:00Z", html)

  test("encode/parse roundtrip: single record, plain and gzipped") {
    val rec = resp(7, "<html><body><p>seven &amp; more</p></body></html>")
    for (bytes <- Seq(rec, Warc.gzipMember(rec))) {
      val rows = Warc.parseFile("f", bytes)
      assert(rows.length == 1)
      val r = rows.head
      assert(r.reject_reason == null)
      assert(r.warc_type == "response")
      assert(r.target_uri == "http://crawl.test/doc/7")
      assert(r.record_id == "<urn:uuid:doc-00000007>")
      assert(r.http_status == 200)
      assert(r.body == "<html><body><p>seven &amp; more</p></body></html>")
    }
  }

  test("multi-member .warc.gz preserves record order and offsets") {
    val file = Warc.warcGzFile((1L to 5L).map(i => resp(i, s"<p>doc $i</p>")))
    val rows = Warc.parseFile("f", file)
    assert(rows.length == 5 && rows.forall(_.reject_reason == null))
    assert(rows.map(_.target_uri) == (1L to 5L).map(i => s"http://crawl.test/doc/$i"))
    assert(rows.map(_.offset) == rows.map(_.offset).sorted)
  }

  test("non-ASCII body survives the UTF-8 byte roundtrip") {
    val html = "<p>días 東京 żółć §</p>"
    val rows = Warc.parseFile("f", Warc.gzipMember(resp(1, html)))
    assert(rows.head.body == html)
    // Content-Length counts BYTES, not chars — reparse from raw to be sure
    val raw = new String(resp(1, html), UTF_8)
    val lenLine = raw.split("\r\n").find(_.startsWith("Content-Length:")).get
    assert(lenLine.split(" ")(1).toInt > html.length) // multibyte chars
  }

  test("quarantine: corrupt gzip, bad length, missing type, garbage tail") {
    val bad1 = Warc.parseFile("f", Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3))
    assert(bad1.length == 1 && bad1.head.reject_reason.contains("gzip"))

    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload").getBytes(UTF_8)
    assert(Warc.parseFile("f", noLen).head.reject_reason.contains("Content-Length"))

    val overrun = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort").getBytes(UTF_8)
    assert(Warc.parseFile("f", overrun).head.reject_reason.contains("overruns"))

    // a good record followed by garbage: record parses, tail is one reject
    val good = resp(3, "<p>x</p>")
    val mixed = good ++ "NOT A WARC RECORD AT ALL".getBytes(UTF_8)
    val rows = Warc.parseFile("f", mixed)
    assert(rows.length == 2)
    assert(rows.head.reject_reason == null && rows.head.http_status == 200)
    assert(rows(1).reject_reason != null)

    // missing WARC-Type is a per-record reject but framing recovers: the
    // NEXT record still parses
    val typeless = ("WARC/1.0\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n").getBytes(UTF_8)
    val rows2 = Warc.parseFile("f", typeless ++ good)
    assert(rows2.length == 2)
    assert(rows2.head.reject_reason.contains("WARC-Type"))
    assert(rows2(1).reject_reason == null)
  }

  test("corrupt gzip member mid-file salvages earlier records, quarantines tail") {
    val good1 = Warc.gzipMember(resp(1, "<p>one</p>"))
    val good2 = Warc.gzipMember(resp(2, "<p>two</p>"))
    // member 2's deflate data corrupted: records from member 1 survive,
    // the rest of the file is one quarantine row
    val corrupt2 = good2.clone
    corrupt2(good2.length / 2) = (corrupt2(good2.length / 2) ^ 0x55).toByte
    val rows = Warc.parseFile("f", good1 ++ corrupt2 ++ good1)
    assert(rows.count(_.reject_reason == null) >= 1)
    assert(rows.head.target_uri == "http://crawl.test/doc/1")
    assert(rows.exists(r => r.reject_reason != null && r.reject_reason.contains("gzip")))
    // a valid member followed by a corrupted MAGIC (the case Java's
    // multi-member GZIPInputStream silently swallows): earlier records
    // survive AND the tail is visibly quarantined, never silently dropped
    val badMagic = good2.clone
    badMagic(0) = 0x00
    val rows2 = Warc.parseFile("f", good1 ++ badMagic)
    assert(rows2.count(_.reject_reason == null) == 1)
    assert(rows2.head.target_uri == "http://crawl.test/doc/1")
    assert(rows2.exists(r => r.reject_reason != null && r.reject_reason.contains("gzip")))
    // truncated last member: same salvage discipline
    val rows3 = Warc.parseFile("f", good1 ++ good2.take(good2.length - 3))
    assert(rows3.count(_.reject_reason == null) >= 1)
    assert(rows3.exists(_.reject_reason != null))
  }

  test("arbitrary bytes never throw") {
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Warc.parseFile("f", junk)
    }
  }

  test("Spark read path: binaryFile glob -> records -> quarantine split") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc-src")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"),
      Warc.warcGzFile(Seq(resp(1, "<p>a</p>"), resp(2, "<p>bb</p>"))))
    // a garbage MEMBER (valid gzip, invalid WARC) — plain trailing bytes
    // after the last member would be dropped by GZIPInputStream itself
    java.nio.file.Files.write(dir.resolve("b.warc.gz"),
      Warc.warcGzFile(Seq(resp(3, "<p>ccc</p>"))) ++
        Warc.gzipMember("trailing garbage member".getBytes(UTF_8)))
    val df = Warc.read(spark, dir.toString + "/*.warc.gz")
    val (ok, rejects) = graft.airbnb.Sources.quarantine(df, col("reject_reason").isNull)
    assert(ok.count() == 3)
    assert(rejects.count() == 1) // the garbage tail of b.warc.gz
    val bodies = ok.select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"),
        col("body")).as[(Long, String)].collect().toMap
    assert(bodies == Map(1L -> "<p>a</p>", 2L -> "<p>bb</p>", 3L -> "<p>ccc</p>"))
  }
}
