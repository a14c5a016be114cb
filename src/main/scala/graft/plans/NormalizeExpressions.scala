package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a per-row codegen kernel — the first pass
  * of every text-curation pipeline (exact dedup and shingle hashing are only
  * meaningful after the corpus agrees on one canonical byte form).
  *
  * Pipeline (mirrored exactly by the DuckDB oracle as
  * `trim(regexp_replace(strip_accents(nfc_normalize(lower(s))), '\s+', ' ', 'g'))`):
  *   1. lower-case (Locale.ROOT — locale-independent, matches engine lower()),
  *   2. NFC normalize (canonical composition; java.text.Normalizer and the
  *      engines implement the same Unicode algorithm),
  *   3. accent strip = NFD decompose + drop combining marks (category Mn),
  *   4. collapse whitespace runs to single spaces, THEN trim spaces.
  *
  * Step 4's order and character class are part of the contract: `\s` is the
  * ASCII class in both Java regex and DuckDB's RE2, so after the collapse
  * every edge whitespace char IS an ASCII space — trimming spaces only (not
  * String.strip(), whose Character.isWhitespace also eats U+2028-style
  * Unicode whitespace that DuckDB's trim would keep) makes the two engines
  * agree on every input, not just inputs with space-only edges. Non-ASCII
  * whitespace (NBSP, em-space…) is deliberately untouched by both.
  *
  * Cross-engine caveat pinned by the oracle: engines' accent-strip tables
  * agree on combining-mark removal (the é→e family) but can differ on
  * LETTER replacements (œ→oe, ß→ss) — those are transliteration, not
  * normalization, and are deliberately out of scope here.
  *
  * Scale: pure map-side, stays inside whole-stage codegen; the corpus never
  * shuffles for normalization.
  */
object NormalizeKernel {

  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val marksRe = java.util.regex.Pattern.compile("\\p{Mn}+")

  def normalize(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nfc = Normalizer.normalize(lowered, Normalizer.Form.NFC)
    val stripped = marksRe.matcher(Normalizer.normalize(nfc, Normalizer.Form.NFD))
      .replaceAll("")
    val collapsed = wsRe.matcher(stripped).replaceAll(" ")
    // trim ASCII spaces only — the collapse has already turned every \s edge
    // run into one space, and DuckDB's trim() strips exactly spaces
    var i = 0; var j = collapsed.length
    while (i < j && collapsed.charAt(i) == ' ') i += 1
    while (j > i && collapsed.charAt(j - 1) == ' ') j -= 1
    UTF8String.fromString(collapsed.substring(i, j))
  }
}

/** string → canonical lowercase accent-free single-spaced string. */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.NormalizeKernel.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
