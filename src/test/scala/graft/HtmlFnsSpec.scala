package graft

import graft.functions.HtmlFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def visible(html: String): String =
    Seq(html).toDF("h").select(HtmlFns.visibleText($"h")).collect().head.getString(0)
  private def clean(html: String): String =
    Seq(html).toDF("h").select(HtmlFns.cleanText($"h")).collect().head.getString(0)
  private def titleOf(html: String): String =
    Seq(html).toDF("h").select(HtmlFns.title($"h")).collect().head.getString(0)
  private def anchors(html: String): Long =
    Seq(html).toDF("h").select(HtmlFns.anchorChars($"h")).collect().head.getLong(0)

  test("visibleText strips tags, inserts word boundaries, collapses ws") {
    assert(visible("<p>hello</p><p>world</p>") == "hello world")
    assert(visible("<div><b>bo</b>ld</div>") == "bo ld")
    assert(visible("") == "")
    assert(visible("plain text, no markup") == "plain text, no markup")
  }

  test("script and style elements vanish wholly, including their text") {
    assert(visible("a<script>if (1 < 2) { x = \"q\"; }</script>b") == "a b")
    assert(visible("a<style>p { color: red; }</style>b") == "a b")
    assert(visible("a<SCRIPT src='x'>y</SCRIPT>b") == "a b")
    // multiline script bodies (dotall)
    assert(visible("a<script>\nline1\nline2\n</script>b") == "a b")
    // two script elements: lazy match must not swallow the text between them
    assert(visible("<script>x</script>mid<script>y</script>") == "mid")
  }

  test("comments vanish; a </p> inside a comment is not a block boundary") {
    assert(visible("a<!-- hidden -->b") == "a b")
    assert(visible("a<!-- multi\nline -->b") == "a b")
    val doc = "<body><p>one<!-- </p> --> two</p><p>three</p></body>"
    val blocks = Seq(doc).toDF("h")
      .select(HtmlFns.bodyBlocks($"h")).collect().head.getSeq[String](0)
    assert(blocks.map(b => b.replaceAll("<[^>]*>", "").trim) ==
      Seq("one  two", "three", ""))
  }

  test("entity decode is amp-last: &amp;lt; means literal '&lt;', not '<'") {
    assert(visible("<p>Tom &amp; Jerry</p>") == "Tom & Jerry")
    assert(visible("<p>&lt;3&gt;</p>") == "<3>")
    assert(visible("<p>&amp;lt;</p>") == "&lt;")
    assert(visible("<p>&quot;q&quot; &#39;s&#39;</p>") == "\"q\" 's'")
    assert(visible("<p>a&nbsp;&nbsp;b</p>") == "a b") // nbsp then collapse
  }

  test("title extraction: decoded, ws-collapsed, '' when absent") {
    assert(titleOf("<head><title>A &amp;  B</title></head>") == "A & B")
    assert(titleOf("<title lang=\"en\">x</title>") == "x")
    assert(titleOf("<p>no title</p>") == "")
  }

  test("anchorChars counts visible anchor text only, across all anchors") {
    assert(anchors("""<a href="/x">one</a> gap <a>two2</a>""") == 7L)
    assert(anchors("<p>no anchors</p>") == 0L)
    // markup inside the anchor is stripped before counting
    assert(anchors("<a href='x'><b>bo</b>ld</a>") == 5L) // "bo ld"
    // <abbr> must not match the <a...> pattern
    assert(anchors("<abbr>zz</abbr>") == 0L)
  }

  test("cleanText drops link-dense and empty blocks, keeps prose blocks") {
    val doc = "<html><body>" +
      "<p>real prose stays here</p>" +
      "<div><a href='/a'>nav</a> <a href='/b'>more nav</a></div>" +
      "<p>tail prose</p></body></html>"
    assert(clean(doc) == "real prose stays here tail prose")
    // exactly at 1/3 link density the block is KEPT (<= rule)
    val edge = "<body><p><a href='x'>ab</a> cdef</p></body>" // 2 anchor / 7 text? "ab cdef"=7, 3*2=6<=7
    assert(clean(edge) == "ab cdef")
    assert(clean("<body><div></div></body>") == "")
    assert(clean("no body element at all") == "")
  }

  test("block split is case-insensitive across p/div/li/h1-6") {
    val doc = "<body>a</P>b</DIV>c</li>d</h3>e</body>"
    val blocks = Seq(doc).toDF("h")
      .select(HtmlFns.bodyBlocks($"h")).collect().head.getSeq[String](0)
    assert(blocks == Seq("a", "b", "c", "d", "e"))
  }

  test("hostile input: unterminated elements degrade gracefully, no throw") {
    // unclosed <script>: the lazy block regex finds no closer, so only the
    // bare tag is stripped and the orphan text survives as visible text
    assert(visible("a<script>never closed") == "a never closed")
    // unclosed comment: no '-->' and no '>' at all — the raw text survives
    assert(visible("x<!-- unclosed") == "x<!-- unclosed")
    // attribute containing '>' ends the tag early (regex model, both engines)
    assert(visible("<a title=\"a>b\">t</a>") == "b\">t")
  }
}
