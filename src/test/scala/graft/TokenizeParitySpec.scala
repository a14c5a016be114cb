package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WsTokens kernel's contract is BYTE-EXACT equality with the built-in
  * chain it replaces: split(lower(wsTrim(s)), "\\s+") — see
  * graft.plans.TokenizeKernel. Every text operator's oracle replays the
  * chain form in DuckDB, so any divergence here would fail oracle rows far
  * downstream; this spec pins the equivalence at the source, exhaustively
  * over the code points where the two whitespace classes live and on
  * adversarial fuzz strings.
  */
class TokenizeParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def assertParity(strings: Seq[String], label: String): Unit = {
    import spark.implicits._
    val df = strings.toDF("s")
      .select(col("s"),
        graft.functions.TextFns.tokens(col("s")).as("k"),
        graft.functions.TextFns.tokensHof(col("s")).as("h"))
    val bad = df.collect().filter { r =>
      r.getSeq[String](1) != r.getSeq[String](2)
    }
    assert(bad.isEmpty, s"$label: kernel != HOF chain for " +
      bad.take(5).map(r => s"${r.getString(0).map(c => f"\\u${c.toInt}%04x").mkString}" +
        s" kernel=${r.getSeq[String](1)} hof=${r.getSeq[String](2)}").mkString("; "))
  }

  test("exhaustive per-code-point parity through U+30FF plus high samples") {
    // Both whitespace classes (Unicode White_Space for the end trim, ASCII
    // \s for the split) live entirely below U+3001; lowercase parity is by
    // construction (the kernel calls UTF8String.toLowerCase, the exact
    // method lower() runs). Each code point is exercised alone, at each
    // edge, between letters, and doubled.
    val cps = (0x0000 to 0x30ff).filterNot(cp => cp >= 0xd800 && cp <= 0xdfff) ++
      Seq(0xfb00, 0xfe0f, 0x1d400, 0x1f600, 0x10ffff) // incl. 4-byte UTF-8
    val strings = cps.flatMap { cp =>
      val c = new String(Character.toChars(cp))
      Seq(c, s"a$c", s"${c}a", s"a${c}b", s"$c$c", s" a$c\tb$c ")
    }
    assertParity(strings, "per-code-point")
  }

  test("edge and fuzz strings") {
    val edge = Seq("", " ", "  ", "\t", "\n\r", "a", "a b",
      "a  b", "A B\tC", "  leading", "trailing  ", " ", " a ",
      "a b", "　日本語　", "İstanbul", "ẞhout", "ǅungla",
      "étude", "😀 emoji 🚀", "mixed lines here",
      "nel", "tab\tand\nnewline", " ogham ",
      "   ", "a​b", "ᾈ ᾨ", "ﬁﬂ ﬆ")
    assertParity(edge, "edge")
    val rnd = new scala.util.Random(42)
    val alphabet = "ab \t\n 　É😀ßİx .-"
    val fuzz = (1 to 400).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertParity(fuzz, "fuzz")
  }

  test("fixture corpus parity (every documents row)") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val bad = docs.select(
        graft.functions.TextFns.tokens(col("text")).as("k"),
        graft.functions.TextFns.tokensHof(col("text")).as("h"))
      .filter(not(col("k") === col("h")))
      .count()
    assert(bad == 0, s"$bad fixture rows tokenize differently")
  }
}
