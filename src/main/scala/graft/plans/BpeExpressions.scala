package graft.plans

import graft.functions.TextFns
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table BPE tokenization as a per-row codegen kernel.
  *
  * Real byte-pair encoding, not a regex approximation: a fixed merges table
  * (TextFns.bpeMerges — rank-ordered, training-consistent) is applied to each
  * pre-token. Applying the rules once each in rank order with leftmost
  * non-overlapping merging is EXACTLY classic BPE encoding for any
  * training-consistent table: a merge can only create a token that
  * later-ranked rules reference (BPE training builds tokens bottom-up), so a
  * lower-ranked rule can never become applicable again after its pass —
  * and within one rule's pass a merge cannot re-create its own pattern
  * (ab=a or ab=b would need an empty side). The same property makes the
  * merge chain expressible in DuckDB as nested `replace()` calls
  * (TextFns.bpeCountSql), so the oracle runs the REAL algorithm, not a
  * fixture of precomputed counts.
  *
  * Token-count contract (mirrored exactly by the SQL): a pre-token of
  * lowercase letters is BPE-merged from characters; a digit run counts one
  * token per digit (no digit merges in the table); any other pre-token
  * (single symbol by construction of the pre-tokenizer regex) counts 1.
  *
  * Scale: a pure map-side expression inside whole-stage codegen — the corpus
  * token count ("how many tokens is this corpus?") needs one narrow pass and
  * one tiny aggregate, no shuffle of text.
  */
object BpeKernel {

  private val mergeA: Array[String] = TextFns.bpeMerges.map(_._1).toArray
  private val mergeB: Array[String] = TextFns.bpeMerges.map(_._2).toArray
  private val nMerges = mergeA.length

  private val lettersRe = java.util.regex.Pattern.compile("[a-z]+")
  private val digitsRe = java.util.regex.Pattern.compile("[0-9]+")

  /** BPE token sequence of one lowercase-letter word. */
  def bpeWord(word: String): Array[String] = {
    var seq = new Array[String](word.length)
    var i = 0
    while (i < word.length) { seq(i) = String.valueOf(word.charAt(i)); i += 1 }
    var r = 0
    while (r < nMerges) {
      val a = mergeA(r); val b = mergeB(r)
      var read = 0
      var write = 0
      while (read < seq.length) {
        if (read < seq.length - 1 && seq(read) == a && seq(read + 1) == b) {
          seq(write) = a + b; read += 2
        } else {
          seq(write) = seq(read); read += 1
        }
        write += 1
      }
      if (write < seq.length) seq = java.util.Arrays.copyOf(seq, write)
      r += 1
    }
    seq
  }

  private def wordTokenCount(w: String): Long =
    if (lettersRe.matcher(w).matches()) bpeWord(w).length.toLong
    else if (digitsRe.matcher(w).matches()) w.length.toLong
    else 1L

  /** Total BPE token count over an array of pre-tokens. */
  def bpeCount(pre: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = pre.numElements()
    while (i < n) {
      if (!pre.isNullAt(i)) total += wordTokenCount(pre.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  /** Full BPE token sequence over an array of pre-tokens (spec surface). */
  def bpeTokens(pre: ArrayData): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = pre.numElements()
    while (i < n) {
      if (!pre.isNullAt(i)) {
        val w = pre.getUTF8String(i).toString
        if (lettersRe.matcher(w).matches())
          bpeWord(w).foreach(t => out += UTF8String.fromString(t))
        else if (digitsRe.matcher(w).matches())
          w.foreach(c => out += UTF8String.fromString(String.valueOf(c)))
        else out += UTF8String.fromString(w)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

private[plans] trait PreTokenArrayInput { self: UnaryExpression =>
  def fnName: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fnName requires array<string> pre-tokens, got $other")
  }
}

/** array<string> pre-tokens → long total BPE token count. */
case class BpeCount(child: Expression)
    extends UnaryExpression with PreTokenArrayInput {
  override def fnName: String = "bpe_count"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.bpeCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.BpeKernel.bpeCount($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** array<string> pre-tokens → array<string> BPE tokens. */
case class BpeTokens(child: Expression)
    extends UnaryExpression with PreTokenArrayInput {
  override def fnName: String = "bpe_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.bpeTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.BpeKernel.bpeTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
