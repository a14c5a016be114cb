package graft.operators

/** Shared validation helpers for persisted-fit frames (DSIR weight tables,
  * k-means/IVF centroid matrices, PQ codebooks). Every loader follows the
  * same contract: ONE bounded collect of the whole frame — the shape
  * columns ride that collect, never separate per-column distinct jobs —
  * then declared-shape resolution with trailing-hole and duplicate-row
  * rejection.
  */
private[operators] object FitFrames {

  /** Resolve a declared shape dimension: explicit parameter beats the
    * persisted column's values (which must be a single constant) beats the
    * max()+1 derivation (legacy frames without shape columns — those still
    * reject interior holes but cannot detect trailing loss).
    */
  def declared(name: String, explicit: Int, persisted: Option[Array[Long]],
               derived: => Int): Int =
    if (explicit > 0) explicit
    else persisted match {
      case Some(vs) =>
        val d = vs.distinct
        require(d.length == 1, s"inconsistent $name: ${d.length} values")
        d.head.toInt
      case None => derived
    }

  /** Reject a frame whose key rows collapsed in a map build — duplicate
    * keys (e.g. a double append) would otherwise silently keep one of two
    * conflicting values.
    */
  def requireNoDuplicates(what: String, collected: Int, distinctKeys: Int): Unit =
    require(collected == distinctKeys,
      s"$what has duplicate key rows: $collected rows, $distinctKeys distinct keys")
}
