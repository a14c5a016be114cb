package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (dedup, language-ID, quality scoring, fingerprinting). All are built-in
  * expression compositions (codegen'd, distributed); the char-level
  * polynomial hash is deliberately engine-portable so DuckDB oracles can
  * reproduce it bit-for-bit.
  */
object TextFns {

  /** Whitespace tokenization, lowercased — Python str.split() semantics:
    * leading/trailing whitespace of ANY kind is ignored (CleanFns.wsTrim;
    * plain trim() strips spaces only, which fed a phantom empty first token
    * on tab-padded text). Oracles keep plain trim(): fixture text carries no
    * non-space padding, so results agree; the Spark side is the stricter one.
    */
  def tokens(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.WsTokens(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** The built-in expression chain [[tokens]] replaces — kept (and pinned
    * byte-exact against the kernel by TokenizeParitySpec) so the contract
    * cannot drift: the kernel IS split(lower(wsTrim(s)), "\\s+").
    */
  def tokensHof(c: Column): Column =
    split(lower(graft.functions.CleanFns.wsTrim(c)), "\\s+")

  /** Token count (whitespace tokenizer; reference U4's 100-char snippet is a
    * cruder cousin, scripts/app/language_detection.py:79).
    */
  def tokenCount(c: Column): Column =
    size(split(graft.functions.CleanFns.wsTrim(c), "\\s+"))

  /** Word k-gram shingles of a token-array column. Callers must filter
    * `size(tokens) >= k` first (Spark's `sequence(1, n)` runs descending when
    * n < 1, which would fabricate shingles).
    */
  def shingleExpr(tokensCol: String, k: Int): Column =
    expr(s"transform(sequence(1, size($tokensCol) - ${k - 1}), " +
         s"i -> concat_ws(' ', slice($tokensCol, i, $k)))")

  /** Portable 31-base polynomial string hash mod 2^31-1 (seed 7).
    * Same arithmetic as the DuckDB `list_reduce` form in the oracles, so
    * minhash/simhash signatures hash-match across engines.
    */
  def polyHash(colName: String): Column =
    expr(s"aggregate(split($colName, ''), 7L, " +
         s"(acc, x) -> (acc * 31 + ascii(x)) % 2147483647)")

  /** DuckDB rendering of [[polyHash]] — kept adjacent so the two cannot drift. */
  def polyHashSql(c: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
    s"list_transform(string_split($c, ''), x -> CAST(ascii(x) AS BIGINT))), " +
    s"(a, b) -> (a * 31 + b) % 2147483647)"

  /** Document fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(graft.functions.CleanFns.wsTrim(c), "\\s+", " ")))

  /** Overlapping token-window chunks (context-window packing for training
    * corpora): chunk i covers tokens [1 + i·stride, +size), the tail chunk is
    * shorter. Returns an array of chunk strings over a token-array column.
    */
  def chunkExpr(tokensCol: String, size: Int, stride: Int): Column = {
    require(size >= 1 && stride >= 1, "size and stride must be >= 1")
    expr(s"transform(sequence(1, size($tokensCol), $stride), " +
         s"st -> array_join(slice($tokensCol, st, $size), ' '))")
  }

  /** PII scrubbing: emails then phone-like digit groups replaced with typed
    * placeholder tokens. Patterns are deliberately RE2-compatible so the
    * DuckDB oracle applies the identical regexes.
    */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phoneRe = "\\b[0-9]{3}[- ][0-9]{4}\\b"
  def piiScrub(c: Column): Column =
    regexp_replace(regexp_replace(c, emailRe, "[EMAIL]"), phoneRe, "[PHONE]")

  /** BPE pre-tokenizer: letter runs, digit runs, single symbols — the shape
    * BPE vocabularies assume. (Spark and DuckDB regex flavors agree here.)
    */
  val preTokenRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def preTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(preTokenRe), lit(0))

  /** Fixed BPE merges table, rank-ordered and TRAINING-CONSISTENT: every
    * composite side is created by an earlier rule. That property is what
    * makes one in-order pass per rule exactly classic BPE encoding (a
    * lower-ranked rule can never become applicable again — see
    * graft.plans.BpeKernel), and what lets the DuckDB oracle run the same
    * algorithm as a nested `replace()` chain ([[bpeMergeChainSql]]).
    */
  val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "i" -> "n", "a" -> "n", "r" -> "e", "o" -> "n", "e" -> "r",
    "a" -> "t", "e" -> "n", "o" -> "r", "e" -> "s", "s" -> "t", "a" -> "l",
    "o" -> "u", "i" -> "s", "i" -> "t", "l" -> "e", "e" -> "d", "c" -> "h",
    "s" -> "h", "w" -> "h", "th" -> "e", "an" -> "d", "in" -> "g", "t" -> "o",
    "o" -> "f", "a" -> "r", "e" -> "a", "q" -> "u", "s" -> "e", "d" -> "e",
    "m" -> "e", "h" -> "i", "er" -> "s", "at" -> "e", "u" -> "n", "w" -> "e")

  /** Unicode canonicalization (lower → NFC → accent strip → ws collapse) as
    * a map-side codegen kernel — see graft.plans.NormalizeKernel.
    */
  def normalizeText(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.NormalizeText(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Total BPE token count over a pre-token array column (map-side kernel). */
  def bpeCount(pre: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.BpeCount(
      org.apache.spark.sql.GraftColumnBridge.expression(pre)))

  /** Full BPE token sequence over a pre-token array column. */
  def bpeTokens(pre: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.plans.BpeTokens(
      org.apache.spark.sql.GraftColumnBridge.expression(pre)))

  /** DuckDB rendering of the BPE merge chain over one lowercase-letter word
    * expression: the word is exploded to '.'-delimited characters
    * ("the" → ".t..h..e."), each merge rule becomes one plain (non-regex)
    * `replace` — leftmost non-overlapping, the same scan order as the
    * kernel — and the result string's token count is `count('..') + 1`.
    * Kept adjacent to [[bpeMerges]] so the two cannot drift.
    */
  def bpeMergeChainSql(wordExpr: String): String = {
    val enc = s"'.' || array_to_string(string_split($wordExpr, ''), '..') || '.'"
    bpeMerges.foldLeft(enc) { case (acc, (a, b)) =>
      s"replace($acc, '.$a..$b.', '.$a$b.')"
    }
  }

  /** Per-element [[polyHash]] over a string-array column (one portable
    * 31-bit hash per element) — the rolling-hash stream winnowing and
    * Count-Min sketches consume.
    */
  def polyHashEach(arrCol: String): Column =
    expr(s"transform($arrCol, e -> aggregate(split(e, ''), 7L, " +
         s"(acc, x) -> (acc * 31 + ascii(x)) % 2147483647))")

  /** DuckDB rendering of [[polyHashEach]] — kept adjacent so the two cannot
    * drift (`arr` is a DuckDB list expression).
    */
  def polyHashEachSql(arr: String): String =
    s"list_transform($arr, e -> ${polyHashSql("e")})"

  /** Winnowing fingerprint selection (Schleimer et al. 2003): the set of
    * window minima over `w` consecutive k-gram hashes. Documents shorter
    * than one full window contribute their global minimum (the paper's
    * boundary rule), so every non-empty hash stream yields >= 1
    * fingerprint. Returns the DISTINCT fingerprint array (set semantics —
    * guarantee: any shared substring of length >= w + k - 1 tokens shares
    * at least one fingerprint). Pure map-side array arithmetic.
    */
  def winnowExpr(hashesCol: String, w: Int): Column = {
    require(w >= 1, s"window must be >= 1: $w")
    expr(s"""CASE
        WHEN size($hashesCol) = 0 THEN CAST(array() AS ARRAY<BIGINT>)
        WHEN size($hashesCol) < $w THEN array(array_min($hashesCol))
        ELSE array_distinct(transform(sequence(1, size($hashesCol) - ${w - 1}),
               j -> array_min(slice($hashesCol, j, $w))))
      END""")
  }

  /** DuckDB rendering of [[winnowExpr]] over a list expression `hs`. */
  def winnowSql(hs: String, w: Int): String =
    s"""CASE
        WHEN len($hs) = 0 THEN CAST([] AS BIGINT[])
        WHEN len($hs) < $w THEN [list_min($hs)]
        ELSE list_distinct(list_transform(range(1, len($hs) - ${w - 2}),
               j -> list_min(($hs)[j:j+${w - 1}])))
      END"""

  /** Minhash permutation constants (a, b) for h' = (a*h + b) mod P. */
  val minhashPerms: Seq[(Long, Long)] = Seq(
    (131L, 101L), (523L, 9L), (2029L, 37L), (3571L, 3L),
    (7919L, 11L), (10007L, 5L), (31L, 1009L), (104729L, 7L))
  val minhashP: Long = 1000000007L

  /** SimHash token-hash widening: [[polyHash]] yields 31 informative bits;
    * a second affine transform of the same hash mod the same prime (the
    * MinHash-perm trick) fills bits 31..61, so simhash signatures up to 62
    * bits carry signal in every bit position:
    * `h62 = h | (((h * A + B) % 2147483647) << 31)`.
    * Bits 0..30 of h62 are h unchanged, so signatures at `bits <= 31` are
    * byte-identical to the narrow form (existing oracles unaffected).
    */
  val simhashWidenA: Long = 1000003L
  val simhashWidenB: Long = 17L

  /** Second (independent) simhash family for the TWO-LONG 124-bit signature
    * (`Dedup.simhashNearDupPairsWide`): the token hash is re-mixed with a
    * different affine transform BEFORE the same 62-bit widening, so the
    * second long's bits are independent of the first's:
    * `h' = (h * AltA + AltB) % 2147483647`, then widen h' as above.
    * Overflow-safe in both engines: h < 2^31 and AltA ~ 2^20, so every
    * intermediate product stays under 2^52.
    */
  val simhashAltA: Long = 999983L
  val simhashAltB: Long = 29L
}
