package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** HTML/markup text extraction — step zero of a crawl-derived training
  * corpus (the reference ingests pre-cleaned CSVs; a 100 TB pipeline starts
  * from markup). Everything here is a composition of codegen'd built-ins
  * (regexp_replace / regexp_extract / split / higher-order functions) — no
  * UDFs, no driver work — so extraction runs inside WholeStageCodegen at the
  * scan and the whole family is oracle-checkable in DuckDB via the adjacent
  * `*Sql` renderers (kept in this file so the two engines cannot drift).
  *
  * Extraction model (the public trafilatura/jusText shape, simplified to
  * regex-expressible rules so both engines agree bit-for-bit):
  *   1. strip `<!-- -->` comments, whole `<script>`/`<style>` elements;
  *   2. strip remaining tags (each replaced by a space — tag boundaries are
  *      word boundaries);
  *   3. decode the six core entities, `&amp;` LAST (standard decode order:
  *      `&amp;lt;` means the literal text "&lt;", not "<");
  *   4. collapse whitespace runs and trim.
  * Boilerplate removal is jusText-style link-density: the body splits into
  * blocks at closing block-tags, a block is kept iff its visible text is
  * non-empty and anchor text is at most 1/3 of it (integer compare —
  * `3·anchor_chars <= text_chars` — so the rule is engine-exact).
  */
object HtmlFns {

  /** Core entity decode table. `&amp;` MUST be last (see scaladoc). */
  val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private val commentRe = "(?s)<!--.*?-->"
  private val scriptRe  = "(?is)<script[^>]*>.*?</script>"
  private val styleRe   = "(?is)<style[^>]*>.*?</style>"
  private val tagRe     = "<[^>]*>"
  private val titleRe   = "(?is)<title[^>]*>(.*?)</title>"
  private val bodyRe    = "(?is)<body[^>]*>(.*)</body>"
  private val anchorRe  = "(?is)<a(?:\\s[^>]*)?>(.*?)</a>"
  /** Closing block-level tags delimit boilerplate blocks. */
  private val blockSplitRe = "(?i)</(?:p|div|li|h[1-6])>"

  /** Decode the six core entities (amp-last order). */
  def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }

  private def decodeEntitiesSql(c: String): String =
    entities.foldLeft(c) { case (acc, (e, r)) =>
      val rq = if (r == "'") "''" else r
      s"replace($acc, '$e', '$rq')"
    }

  /** Tag-strip + entity-decode + whitespace-collapse of an HTML fragment
    * (no script/style/comment handling — use [[visibleText]] for whole
    * documents; this is the per-fragment kernel for titles, anchors and
    * blocks whose context already removed those elements).
    */
  def fragmentText(c: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(c, tagRe, " ")), "\\s+", " "))

  private def fragmentTextSql(c: String): String =
    s"trim(regexp_replace(${decodeEntitiesSql(s"regexp_replace($c, '$tagRe', ' ', 'g')")}, '\\s+', ' ', 'g'))"

  /** Visible text of a whole HTML document: comments, script and style
    * elements removed, then the fragment kernel. The title IS visible text
    * (head text survives, as in bs4.get_text) — use [[bodyBlocks]] for
    * body-only processing.
    */
  def visibleText(c: Column): Column =
    fragmentText(
      regexp_replace(regexp_replace(regexp_replace(c, commentRe, " "), scriptRe, " "), styleRe, " "))

  /** DuckDB rendering of [[visibleText]] — kept adjacent so the engines
    * cannot drift (same pattern as TextFns.polyHashSql).
    */
  def visibleTextSql(c: String): String =
    fragmentTextSql(
      s"regexp_replace(regexp_replace(regexp_replace($c, '$commentRe', ' ', 'g'), " +
      s"'$scriptRe', ' ', 'g'), '$styleRe', ' ', 'g')")

  /** Decoded, whitespace-normalized `<title>` text ('' when absent). */
  def title(c: Column): Column = fragmentText(regexp_extract(c, titleRe, 1))

  def titleSql(c: String): String =
    fragmentTextSql(s"coalesce(regexp_extract($c, '$titleRe', 1), '')")

  /** Total visible characters inside `<a>` elements — the numerator of
    * link density. Per-anchor fragment extraction, summed via higher-order
    * functions (array stays in the row; no explode, no shuffle).
    */
  def anchorChars(c: Column): Column =
    aggregate(
      transform(regexp_extract_all(c, lit(anchorRe), lit(1)), a => length(fragmentText(a))),
      lit(0L), (acc, x) => acc + x.cast(LongType))

  def anchorCharsSql(c: String): String =
    s"CAST(coalesce(list_sum(list_transform(regexp_extract_all($c, '$anchorRe', 1), " +
    s"a -> length(${fragmentTextSql("a")}))), 0) AS BIGINT)"

  /** The `<body>` element's inner HTML ('' when absent). */
  def body(c: Column): Column = regexp_extract(c, bodyRe, 1)

  def bodySql(c: String): String = s"coalesce(regexp_extract($c, '$bodyRe', 1), '')"

  /** Body with comments/script/style stripped — the input to block
    * splitting, factored so the block COUNT can be computed without
    * depending on any engine's split-on-trailing-separator semantics.
    */
  private def strippedBody(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(body(c), commentRe, " "), scriptRe, " "), styleRe, " ")

  private def strippedBodySql(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(${bodySql(c)}, " +
    s"'$commentRe', ' ', 'g'), '$scriptRe', ' ', 'g'), '$styleRe', ' ', 'g')"

  /** Body split into boilerplate-decision blocks at closing block-tags.
    * Comments/script/style are stripped BEFORE the split so a `</p>` inside
    * a comment or script cannot fabricate a block boundary.
    */
  def bodyBlocks(c: Column): Column = split(strippedBody(c), blockSplitRe)

  def bodyBlocksSql(c: String): String =
    s"string_split_regex(${strippedBodySql(c)}, '$blockSplitRe')"

  /** Number of boilerplate-decision blocks, defined as (closing-block-tag
    * count + 1) — algebraically identical to `size(bodyBlocks)` under
    * keep-trailing-empty split semantics (Spark's `split` limit=-1), but
    * independent of how any engine's split treats trailing empty fields or
    * empty input. String-split trailing behavior is exactly the kind of
    * detail that drifts between DuckDB releases, and a count must not hang
    * on it.
    */
  def blockCount(c: Column): Column =
    (size(regexp_extract_all(strippedBody(c), lit(blockSplitRe), lit(0))) + 1).cast(LongType)

  def blockCountSql(c: String): String =
    s"CAST(len(regexp_extract_all(${strippedBodySql(c)}, '$blockSplitRe')) + 1 AS BIGINT)"

  /** jusText-style keep rule on one block fragment: non-empty visible text
    * with anchor text at most 1/3 of it (exact integer compare).
    */
  def blockKept(b: Column): Column =
    (length(fragmentText(b)).cast(LongType) > 0L) &&
      (anchorChars(b) * 3L <= length(fragmentText(b)).cast(LongType))

  def blockKeptSql(b: String): String =
    s"(length(${fragmentTextSql(b)}) > 0 AND " +
    s"${anchorCharsSql(b)} * 3 <= length(${fragmentTextSql(b)}))"

  /** Clean text of a whole document: visible text of kept body blocks,
    * space-joined in document order — markup in, training text out.
    */
  def cleanText(c: Column): Column =
    trim(concat_ws(" ",
      filter(transform(bodyBlocks(c), b => when(blockKept(b), fragmentText(b)).otherwise(lit(""))),
        s => length(s) > 0)))

  def cleanTextSql(c: String): String =
    s"trim(coalesce(list_aggregate(list_filter(list_transform(${bodyBlocksSql(c)}, " +
    s"b -> CASE WHEN ${blockKeptSql("b")} THEN ${fragmentTextSql("b")} ELSE '' END), " +
    s"s -> length(s) > 0), 'string_agg', ' '), ''))"
}
