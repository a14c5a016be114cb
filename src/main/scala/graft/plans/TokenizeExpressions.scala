package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization as ONE per-row codegen kernel — the byte-exact
  * twin of the expression chain every text operator rides
  * (`TextFns.tokens`):
  *
  *   split(lower(regexp_replace(s, "(?U)^\\s+|\\s+$", "")), "\\s+")
  *
  * That chain is the single hottest map computation of the dedup/curation
  * families (it feeds every sketch kernel), and as built-ins it pays three
  * full passes with three materializations per row: a java.util.regex
  * replace (which must first decode the UTF8String to a java String), a
  * lowercase copy, and a regex split that decodes AGAIN, produces a
  * String[] and re-encodes every token to UTF8String. On the fused
  * scan→tokenize→sketch stages FixedCostProbe priced the tokenizer as the
  * dominant share of the serial stage (q_dedup_ngram_jaccard: 636 ms
  * 1-task stage, most of it this chain). The kernel does one trim scan
  * over the raw bytes, one engine lowercase (`UTF8String.toLowerCase` —
  * the exact implementation `lower()` calls, so parity is by
  * construction), and one byte walk that slices tokens out of the lowered
  * buffer without ever constructing a java String or compiling a Pattern.
  *
  * Parity contract (TokenizeParitySpec proves it EXHAUSTIVELY per code
  * point and on adversarial fuzz strings):
  *   - the END trim is Java regex `(?U)\s` = the Unicode White_Space set,
  *     hardcoded below (U+0009–U+000D, U+0020, U+0085, U+00A0, U+1680,
  *     U+2000–U+200A, U+2028, U+2029, U+202F, U+205F, U+3000);
  *   - the SPLIT class is plain Java regex `\s` = ASCII
  *     [ \t\n\x0B\f\r] ONLY — interior non-ASCII whitespace stays inside
  *     tokens, exactly as the built-in chain behaves;
  *   - `split(s, regex, -1)` semantics: the empty string (and an
  *     all-whitespace input, which trims to it) yields ONE empty token,
  *     never an empty array; interior separator runs never yield empty
  *     tokens (\s+ is greedy); no leading/trailing empties exist because
  *     the trim already removed edge ASCII whitespace (a subset of the
  *     Unicode set) and lowercasing can neither create nor destroy
  *     whitespace.
  *
  * Scale: pure map-side, stays inside whole-stage codegen, and cuts the
  * tokenizer's allocation bill to one lowered buffer + one UTF8String per
  * token — at 100 TB this is the per-task work item of guide §1.2 step 2
  * for every corpus scan.
  */
object TokenizeKernel {

  /** Unicode White_Space (what Java regex `(?U)\s` matches) — the END-trim
    * class. All members are <= U+3000 (<= 3 UTF-8 bytes).
    */
  def isUnicodeWs(cp: Int): Boolean = (cp: @annotation.switch) match {
    case 0x09 | 0x0a | 0x0b | 0x0c | 0x0d | 0x20 | 0x85 | 0xa0 | 0x1680 |
         0x2028 | 0x2029 | 0x202f | 0x205f | 0x3000 => true
    case _ => cp >= 0x2000 && cp <= 0x200a
  }

  /** ASCII whitespace (plain Java regex `\s`) — the SPLIT class. All
    * members are single UTF-8 bytes, and UTF-8 continuation bytes are
    * >= 0x80, so a raw byte test never fires inside a multi-byte char.
    */
  private def isAsciiWsByte(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private val EMPTY_TOKEN: Array[AnyRef] = Array(UTF8String.EMPTY_UTF8)

  /** Code point starting at raw(i), or -1 for a 4-byte/truncated sequence
    * (4-byte code points are all > U+3000, never whitespace, so -1 is
    * simply "not whitespace" to both trim loops). Valid UTF-8 assumed —
    * the same contract the byte-walking sketch kernels already carry.
    */
  private def cpAt(raw: Array[Byte], i: Int, end: Int): Int = {
    val b = raw(i) & 0xff
    if (b < 0x80) b
    else if (b < 0xe0) {
      if (i + 1 < end) ((b & 0x1f) << 6) | (raw(i + 1) & 0x3f) else -1
    } else if (b < 0xf0) {
      if (i + 2 < end) ((b & 0x0f) << 12) | ((raw(i + 1) & 0x3f) << 6) |
        (raw(i + 2) & 0x3f)
      else -1
    } else -1
  }

  private def cpLen(b0: Byte): Int = {
    val b = b0 & 0xff
    if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4
  }

  def tokens(s: UTF8String, collationId: Int, useICU: Boolean): GenericArrayData = {
    val raw = s.getBytes // may alias the underlying buffer; read-only below
    var i = 0
    var j = raw.length
    // leading Unicode-whitespace trim: decode code points forward
    var scanning = true
    while (scanning && i < j) {
      val cp = cpAt(raw, i, j)
      if (cp >= 0 && isUnicodeWs(cp)) i += cpLen(raw(i)) else scanning = false
    }
    // trailing trim: step back over one code point at a time
    scanning = true
    while (scanning && j > i) {
      var k = j - 1
      while (k > i && (raw(k) & 0xc0) == 0x80) k -= 1 // skip continuation bytes
      val cp = if (cpLen(raw(k)) == j - k) cpAt(raw, k, j) else -1
      if (cp >= 0 && isUnicodeWs(cp)) j = k else scanning = false
    }
    if (i >= j) return new GenericArrayData(EMPTY_TOKEN.clone())
    // engine lowercase of the trimmed slice — the EXACT dispatch lower()
    // compiles to (CollationSupport.Lower.exec with the expression's
    // collation id and the session's ICU case-mapping flag): plain
    // UTF8String.toLowerCase rides the JDK's Unicode tables, which lag
    // ICU's — TokenizeParitySpec caught U+1C89/U+2C2F staying uppercase.
    val lowered = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
      .exec(UTF8String.fromBytes(raw, i, j - i), collationId, useICU)
    val lb = lowered.getBytes
    val n = lb.length
    // split on ASCII \s+ runs; no edge empties exist (see contract above)
    var cnt = 0
    var p = 0
    var inTok = false
    while (p < n) {
      val ws = isAsciiWsByte(lb(p))
      if (!ws && !inTok) { cnt += 1; inTok = true }
      else if (ws) inTok = false
      p += 1
    }
    if (cnt == 0) return new GenericArrayData(EMPTY_TOKEN.clone())
    val out = new Array[AnyRef](cnt)
    var c = 0
    p = 0
    while (p < n) {
      if (!isAsciiWsByte(lb(p))) {
        val start = p
        while (p < n && !isAsciiWsByte(lb(p))) p += 1
        out(c) = UTF8String.fromBytes(lb, start, p - start)
        c += 1
      } else p += 1
    }
    new GenericArrayData(out)
  }
}

/** string → array<string> whitespace tokens (see TokenizeKernel.tokens —
  * byte-exact with split(lower(wsTrim(s)), "\\s+")).
  */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires string, got $other")
  }

  // the same lazy SQLConf capture Lower itself performs, so the kernel's
  // lowercase dispatch is identical to the built-in's in any session
  private lazy val useICU: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.getConf(
      org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)
  private lazy val collationId: Int = child.dataType match {
    case st: StringType => st.collationId
    case _ => 0
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenizeKernel.tokens(input.asInstanceOf[UTF8String], collationId, useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.TokenizeKernel.tokens($c, $collationId, $useICU);")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}
