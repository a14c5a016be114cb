package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic storage hygiene for queries that RETURN a checkpointed
  * frame (corpus pipeline, connected components): the caller holds the
  * frame, so the query can't free its own blocks — and the ContextCleaner
  * only reclaims them at some later driver GC. Across a 116-query × 2-pass
  * bench that nondeterministic reclaim shows up as warm runs slower than
  * cold (executor storage carries every previous invocation's blocks).
  *
  * [[cycle]] registers the frame under a stable key and frees the PREVIOUS
  * frame registered under that key — each query invocation cleans up after
  * its predecessor, bounding live checkpoint storage at one invocation per
  * key without touching the frame the current caller holds.
  */
object CkptCycle {

  private val last = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def cycle(key: String, df: DataFrame): DataFrame = {
    val prev = last.put(key, df)
    if (prev != null && (prev ne df)) {
      prev.queryExecution.analyzed.foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _              => ()
      }
    }
    df
  }
}
