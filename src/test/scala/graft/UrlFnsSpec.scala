package graft

import graft.functions.UrlFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(url: String): (String, String, Long, String) = {
    val r = Seq(url).toDF("url")
      .select(
        UrlFns.host(col("url")).as("h"),
        UrlFns.registeredDomain(UrlFns.host(col("url"))).as("d"),
        UrlFns.pathDepth(col("url")).as("p"),
        UrlFns.stripTracking(col("url")).as("c"))
      .head()
    (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))
  }

  test("host: scheme, userinfo, port, case") {
    assert(one("https://www.Example.COM/a")._1 == "www.example.com")
    assert(one("http://user:pw@news.site.co.uk:8080/x/y")._1 == "news.site.co.uk")
    assert(one("ftp://plain.host")._1 == "plain.host")
    assert(one("not a url")._1 == "")           // schemeless: not guessed at
    assert(one("https://host?q=1")._1 == "host") // query right after host
  }

  test("registered domain: two-level suffixes and bare hosts") {
    assert(one("https://a.b.site.co.uk/")._2 == "site.co.uk")
    assert(one("https://www.example.com/")._2 == "example.com")
    assert(one("https://deep.sub.example.org/")._2 == "example.org")
    assert(one("https://example.com.au/")._2 == "example.com.au")
    assert(one("https://localhost/")._2 == "")   // single label: no domain
  }

  test("path depth: segments only, query/fragment excluded") {
    assert(one("https://h/a/b/c")._3 == 3L)
    assert(one("https://h/a/b/?q=/x/y")._3 == 2L)
    assert(one("https://h")._3 == 0L)
    assert(one("https://h/")._3 == 0L)
    assert(one("https://h/a//b")._3 == 2L)       // empty segment collapses
  }

  test("strip tracking: removal plus separator repair") {
    assert(one("https://h/p?utm_source=x&id=5")._4 == "https://h/p?id=5")
    assert(one("https://h/p?id=5&utm_campaign=c")._4 == "https://h/p?id=5")
    assert(one("https://h/p?utm_a=1&utm_b=2")._4 == "https://h/p")
    assert(one("https://h/p?fbclid=zz")._4 == "https://h/p")
    assert(one("https://h/p?gclid=1&id=2&utm_x=3")._4 == "https://h/p?id=2")
    assert(one("https://h/p?id=9")._4 == "https://h/p?id=9") // untouched
  }

  test("strip tracking: boundary anchoring and fragment repair") {
    // a param NAME merely containing a tracking key is NOT a tracking param
    assert(one("https://h/p?xgclid=5&q=2")._4 == "https://h/p?xgclid=5&q=2")
    // a VALUE containing 'gclid=' is untouched
    assert(one("https://h/p?redirect=gclid=1")._4 == "https://h/p?redirect=gclid=1")
    // dangling separators before a fragment are repaired
    assert(one("https://h/p?gclid=1#top")._4 == "https://h/p#top")
    assert(one("https://h/p?a=1&gclid=2#f")._4 == "https://h/p?a=1#f")
  }

  test("host: IPv6 bracket literals are not guessed at") {
    assert(one("http://[2001:db8::1]/x")._1 == "")
    assert(one("http://[::1]:8080/")._1 == "")
  }

  test("registered domain: a bare two-level public suffix is no domain") {
    assert(one("https://co.uk/")._2 == "")
    assert(one("https://com.au/x")._2 == "")
    assert(one("https://real.co.uk/")._2 == "real.co.uk") // still works
  }

  test("robots.txt: RFC 9309 longest-match with Allow override") {
    import org.apache.spark.sql.functions.{col, lit}
    val robots = "User-agent: *\nDisallow: /private\nAllow: /private/ok\nDisallow: /tmp"
    def eval(path: String): (Option[Long], Option[Long], Boolean) = {
      val r = spark.range(1).select(
        graft.functions.UrlFns.robotsMatchLen(lit(path),
          graft.functions.UrlFns.robotsPrefixes(lit(robots), "Disallow")).as("d"),
        graft.functions.UrlFns.robotsMatchLen(lit(path),
          graft.functions.UrlFns.robotsPrefixes(lit(robots), "Allow")).as("a"),
        graft.functions.UrlFns.robotsAllowed(lit(path), lit(robots)).as("f"))
        .collect()(0)
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
       if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2))
    }
    assert(eval("/private/data") == (Some(8L), None, false))       // blocked
    assert(eval("/private/ok/x") == (Some(8L), Some(11L), true))   // Allow overrides
    assert(eval("/tmp/x") == (Some(4L), None, false))
    assert(eval("/public/x") == (None, None, true))                // no rule
    // empty Disallow (allow-all idiom) contributes no blocking rule
    val r2 = spark.range(1).select(graft.functions.UrlFns.robotsAllowed(
      lit("/anything"), lit("User-agent: *\nDisallow:")).as("f")).collect()(0)
    assert(r2.getBoolean(0))
    // Allow of EQUAL length wins the tie (the RFC rule)
    val r3 = spark.range(1).select(graft.functions.UrlFns.robotsAllowed(
      lit("/abc/x"), lit("Disallow: /abc\nAllow: /abc")).as("f")).collect()(0)
    assert(r3.getBoolean(0))
    // a CRLF robots file parses identically to its LF twin
    val r4 = spark.range(1).select(
      graft.functions.UrlFns.robotsMatchLen(lit("/private/x"),
        graft.functions.UrlFns.robotsPrefixes(
          lit("User-agent: *\r\nDisallow: /private\r\nAllow: /pub\r\n"),
          "Disallow")).as("d"),
      graft.functions.UrlFns.robotsAllowed(lit("/private/x"),
        lit("User-agent: *\r\nDisallow: /private\r\n")).as("f")).collect()(0)
    assert(r4.getLong(0) == 8L && !r4.getBoolean(1))
  }
}
