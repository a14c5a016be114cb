package graft.queries

import graft.{Q, Tables}
import graft.functions.{HtmlFns, TextFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTML/markup extraction queries — the crawl-ingest step zero the text
  * family previously assumed away (r6/r7 verdicts' top-ranked gap). The
  * fixtures carry no markup column, so each query synthesizes a
  * deterministic HTML document from `documents` (title/style/script head,
  * comment, a text paragraph, a `doc_id`-dependent nav block of repeated
  * anchors, and an entity-test paragraph) — the same stand-in pattern as
  * Multimodal.asMedia — and the DuckDB oracle rebuilds the IDENTICAL string,
  * so extraction itself is what the hash-compare checks.
  *
  * Scale posture: synthesis + extraction are pure row-local expression
  * chains (WholeStageCodegen at the scan, no UDFs, no explode) — the only
  * shuffles are the final aggregations/sorts, on `lang` or top-k.
  */
object MarkupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The synthesized per-row HTML document (see object scaladoc). Kept
    * adjacent to [[synthHtmlSql]] so the two engines cannot drift.
    */
  private def synthHtml: Column = concat(
    lit("<html><head><title>Doc "), col("doc_id").cast(StringType),
    lit(" &amp; "), col("lang"), lit("</title>"),
    lit("<style>p { color: red; }</style>"),
    lit("<script>if (1 < 2) { x = \"a&b\"; }</script></head><body>"),
    lit("<!-- id "), col("doc_id").cast(StringType), lit(" -->"),
    lit("<p>"), col("text"), lit("</p>"),
    lit("<div>"),
    expr("repeat(concat('<a href=\"/l/', source, '\">', source, ' link</a> '), " +
         "CAST(doc_id % 4 AS INT))"),
    lit("</div>"),
    lit("<p>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>"))

  /** DuckDB rendering of [[synthHtml]]. */
  private val synthHtmlSql: String =
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; ' || lang || '</title>'" +
    " || '<style>p { color: red; }</style>'" +
    " || '<script>if (1 < 2) { x = \"a&b\"; }</script></head><body>'" +
    " || '<!-- id ' || CAST(doc_id AS VARCHAR) || ' -->'" +
    " || '<p>' || text || '</p>'" +
    " || '<div>' || repeat('<a href=\"/l/' || source || '\">' || source || ' link</a> ', CAST(doc_id % 4 AS INT)) || '</div>'" +
    " || '<p>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>'"

  private val htmlCte =
    s"WITH h AS (SELECT doc_id, lang, source, $synthHtmlSql AS html FROM documents)"

  val qs: Seq[Q] = Seq(

    // ----- per-document extraction: title, visible text, link density inputs
    Q("q_html_extract",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("html", synthHtml)
          .select(
            col("doc_id"),
            HtmlFns.title(col("html")).as("title"),
            length(HtmlFns.visibleText(col("html"))).cast(LongType).as("text_chars"),
            TextFns.tokenCount(HtmlFns.visibleText(col("html"))).cast(LongType).as("ntok"),
            HtmlFns.anchorChars(col("html")).as("anchor_chars"),
            length(HtmlFns.cleanText(col("html"))).cast(LongType).as("clean_chars"))
          .orderBy(col("doc_id")),
      Some(s"""
        $htmlCte
        SELECT doc_id,
               ${HtmlFns.titleSql("html")} AS title,
               CAST(length(${HtmlFns.visibleTextSql("html")}) AS BIGINT) AS text_chars,
               CAST(len(string_split_regex(trim(${HtmlFns.visibleTextSql("html")}), '\\s+')) AS BIGINT) AS ntok,
               ${HtmlFns.anchorCharsSql("html")} AS anchor_chars,
               CAST(length(${HtmlFns.cleanTextSql("html")}) AS BIGINT) AS clean_chars
        FROM h ORDER BY doc_id""")),

    // ----- jusText-style boilerplate accounting per language
    Q("q_html_boilerplate",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("html", synthHtml)
          .withColumn("blocks", HtmlFns.bodyBlocks(col("html")))
          .select(
            col("lang"),
            size(col("blocks")).cast(LongType).as("nb"),
            aggregate(transform(col("blocks"),
                b => when(HtmlFns.blockKept(b), lit(1L)).otherwise(lit(0L))),
              lit(0L), (a, x) => a + x).as("nk"),
            length(HtmlFns.cleanText(col("html"))).cast(LongType).as("cc"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("nb")).as("n_blocks"),
               sum(col("nk")).as("n_kept"),
               sum(col("cc")).as("clean_chars"))
          .orderBy(col("lang")),
      Some(s"""
        $htmlCte,
        perdoc AS (
          SELECT lang,
                 CAST(len(${HtmlFns.bodyBlocksSql("html")}) AS BIGINT) AS nb,
                 CAST(coalesce(list_sum(list_transform(${HtmlFns.bodyBlocksSql("html")},
                   b -> CASE WHEN ${HtmlFns.blockKeptSql("b")} THEN 1 ELSE 0 END)), 0) AS BIGINT) AS nk,
                 CAST(length(${HtmlFns.cleanTextSql("html")}) AS BIGINT) AS cc
          FROM h)
        SELECT lang, count(*) AS n_docs, SUM(nb) AS n_blocks, SUM(nk) AS n_kept,
               SUM(cc) AS clean_chars
        FROM perdoc GROUP BY lang ORDER BY lang""")),

    // ----- top-k by link density (the boilerplate-heavy pages a curation
    // pass would drop first); density in ppm by exact integer division
    Q("q_html_link_topk",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("html", synthHtml)
          .select(
            col("doc_id"),
            HtmlFns.anchorChars(col("html")).as("anchor_chars"),
            length(HtmlFns.visibleText(col("html"))).cast(LongType).as("text_chars"))
          .withColumn("density_ppm",
            expr("anchor_chars * 1000000L div greatest(text_chars, 1L)"))
          .orderBy(col("density_ppm").desc, col("doc_id"))
          .limit(25),
      Some(s"""
        $htmlCte,
        d AS (
          SELECT doc_id,
                 ${HtmlFns.anchorCharsSql("html")} AS anchor_chars,
                 CAST(length(${HtmlFns.visibleTextSql("html")}) AS BIGINT) AS text_chars
          FROM h)
        SELECT doc_id, anchor_chars, text_chars,
               anchor_chars * 1000000 // greatest(text_chars, 1) AS density_ppm
        FROM d ORDER BY density_ppm DESC, doc_id LIMIT 25""")),

    // ----- crawl ingest end-to-end: documents → spec-conformant .warc.gz
    // files (one gzip member per response record, 8 docs-per-bucket crawl
    // files — the Multimodal.asMedia stand-in pattern at the FILE level) →
    // Warc.records byte parse in executors → HtmlFns clean-text extraction.
    // The oracle never sees the bytes: it recomputes title/clean-text
    // arithmetically from `documents`, so the WARC framing (gzip members,
    // header block, Content-Length, HTTP split) and the extraction are both
    // what the hash-compare checks. A parser that misread a length, lost a
    // member boundary, or mangled UTF-8 through the byte roundtrip
    // mismatches immediately.
    Q("q_warc_extract",
      (s, dir) => {
        import s.implicits._
        val files = t(s, dir, "documents")
          .withColumn("html", synthHtml)
          .select(col("doc_id"), col("html")).as[(Long, String)]
          .groupByKey(_._1 % 8)
          .mapGroups { (bucket, it) =>
            val members = it.toSeq.sortBy(_._1).map { case (id, html) =>
              graft.sources.Warc.encodeResponse(
                f"doc-$id%08d", s"http://crawl.test/doc/$id",
                "2024-01-01T00:00:00Z", html)
            }
            (s"part-$bucket.warc.gz", graft.sources.Warc.warcGzFile(members))
          }
        graft.sources.Warc.records(files)
          .filter(col("reject_reason").isNull)
          .withColumn("doc_id",
            regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast(LongType))
          .select(
            col("doc_id"),
            col("http_status").cast(LongType).as("http_status"),
            HtmlFns.title(col("body")).as("title"),
            length(HtmlFns.cleanText(col("body"))).cast(LongType).as("clean_chars"),
            TextFns.tokenCount(HtmlFns.cleanText(col("body"))).cast(LongType).as("ntok"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        $htmlCte
        SELECT doc_id,
               CAST(200 AS BIGINT) AS http_status,
               ${HtmlFns.titleSql("html")} AS title,
               CAST(length(${HtmlFns.cleanTextSql("html")}) AS BIGINT) AS clean_chars,
               CAST(len(string_split_regex(trim(${HtmlFns.cleanTextSql("html")}), '\\s+')) AS BIGINT) AS ntok
        FROM h ORDER BY doc_id"""))
  )
}
