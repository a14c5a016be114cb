package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def norm(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("s").select(TextFns.normalizeText(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("canonicalizes case, accents, and whitespace") {
    assert(norm(Seq("  Cécile  à\tZürich ", "naïve FAÇADE", "plain ascii")) ==
      Seq("cecile a zurich", "naive facade", "plain ascii"))
  }

  test("NFC/NFD input forms converge to the same bytes") {
    // "é" precomposed (U+00E9) vs decomposed (e + U+0301) must normalize
    // identically — the whole point of canonicalizing before hashing
    assert(norm(Seq("café", "café")) == Seq("cafe", "cafe"))
  }

  test("null-safe and idempotent") {
    assert(norm(Seq(null, "")) == Seq(null, ""))
    val once = norm(Seq("Mëtàl  übér — ÇA"))
    assert(norm(once) == once)
  }

  test("letter replacements are out of scope (normalization, not transliteration)") {
    // ligatures/special letters pass through — engines' transliteration
    // tables differ, so the kernel must not attempt œ→oe / ß→ss
    assert(norm(Seq("œuf straße")) == Seq("œuf straße"))
  }
}
