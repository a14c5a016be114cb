package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge

/** Column API for the per-row document-sketch kernels
  * (graft.plans.SketchExpressions) — the single wrapping point, so operator
  * code never touches the Column ⇄ Expression bridge directly.
  */
object SketchFns {

  /** Distinct word k-gram shingles of a token-array column (first-occurrence
    * order; empty array below k tokens).
    */
  def shinglesDistinct(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(graft.plans.ShinglesDistinct(
      GraftColumnBridge.expression(tokens), k))

  /** Strided chunk hashes of a token-array column — internal join keys
    * for chunk-granular accounting that never surfaces chunk text.
    */
  def chunkHashes(tokens: Column, k: Int, stride: Int): Column =
    GraftColumnBridge.column(graft.plans.ChunkHashes(
      GraftColumnBridge.expression(tokens), k, stride))

  /** Bottom-k distinct shingle polyHash values of a token-array column,
    * ascending — the Broder containment sketch (oracle-portable values).
    */
  def bottomKShingleHashes(tokens: Column, k: Int, bk: Int): Column =
    GraftColumnBridge.column(graft.plans.BottomKShingleHashes(
      GraftColumnBridge.expression(tokens), k, bk))

  /** Strided chunk (hash, text) structs of a token-array column — the
    * removal-side twin of [[chunkHashes]] (same key space), carrying the
    * chunk string for survivor reassembly.
    */
  def chunkHashStrings(tokens: Column, k: Int, stride: Int): Column =
    GraftColumnBridge.column(graft.plans.ChunkHashStrings(
      GraftColumnBridge.expression(tokens), k, stride))

  /** Adjacent-token-pair (hp, hw) hashes of a token-array column — the
    * bigram-LM join keys in one kernel pass (internal keys).
    */
  def pairHashes(tokens: Column): Column =
    GraftColumnBridge.column(graft.plans.PairHashes(
      GraftColumnBridge.expression(tokens)))

  /** Per-token polyHash values of a token-array column (oracle-portable —
    * the kernel form of TextFns.polyHashEach).
    */
  def polyHashEach(tokens: Column): Column =
    GraftColumnBridge.column(graft.plans.PolyHashEach(
      GraftColumnBridge.expression(tokens)))

  /** Winnowing fingerprints of a token-array column (k-gram polyHash
    * window minima — oracle-portable values).
    */
  def winnowFingerprints(tokens: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(graft.plans.WinnowFingerprints(
      GraftColumnBridge.expression(tokens), k, w))

  /** Positional robust-winnowing anchors (pos, h) of a token-array column —
    * the sparse anchor set behind repeatedSpansSparse (internal keys).
    */
  def winnowAnchors(tokens: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(graft.plans.WinnowAnchors(
      GraftColumnBridge.expression(tokens), k, w))

  /** Dense positional anchors (pos, h, sparse) with the winnowing
    * selection flagged inline — one kernel pass feeds both the sparse
    * probe and the dense verify of the serve-shaped substring gate.
    */
  def anchorRows(tokens: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(graft.plans.AnchorRows(
      GraftColumnBridge.expression(tokens), k, w))

  /** Distinct 64-bit shingle hashes of a token-array column — internal
    * join keys for operators that never surface the shingle text.
    */
  def shingleHashes(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(graft.plans.ShingleHashes(
      GraftColumnBridge.expression(tokens), k))

  /** Full MinHash signature (one long per permutation) of a token-array
    * column; null below k tokens.
    */
  def minhashSig(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(graft.plans.MinHashSig(
      GraftColumnBridge.expression(tokens), k))

  /** SimHash (`bits` low bits) over per-token hashes of a token-array column. */
  def simhashBits(tokens: Column, bits: Int): Column =
    GraftColumnBridge.column(graft.plans.SimHashBits(
      GraftColumnBridge.expression(tokens), bits))

  /** Second-family SimHash — the other long of the 124-bit wide signature. */
  def simhashBitsAlt(tokens: Column, bits: Int): Column =
    GraftColumnBridge.column(graft.plans.SimHashBitsAlt(
      GraftColumnBridge.expression(tokens), bits))

  /** Codegen'd membership probe of a broadcast Bloom filter over a long
    * column — the map-side decontamination prefilter, UDF-free.
    */
  def bloomMightContain(hashes: Column,
      bloomBc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    GraftColumnBridge.column(graft.plans.BloomMightContain(
      GraftColumnBridge.expression(hashes), bloomBc))
}
