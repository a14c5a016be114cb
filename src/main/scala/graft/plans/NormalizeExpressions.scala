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
  * `regexp_replace(trim(strip_accents(nfc_normalize(lower(s)))), '\s+', ' ', 'g')`):
  *   1. lower-case (Locale.ROOT — locale-independent, matches engine lower()),
  *   2. NFC normalize (canonical composition; java.text.Normalizer and the
  *      engines implement the same Unicode algorithm),
  *   3. accent strip = NFD decompose + drop combining marks (category Mn),
  *   4. collapse whitespace runs to single spaces and trim.
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
    UTF8String.fromString(wsRe.matcher(stripped).replaceAll(" ").strip())
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
