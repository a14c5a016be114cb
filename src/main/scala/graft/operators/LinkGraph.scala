package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl prioritization — the classic "which
  * domains/pages deserve crawl budget" signal (PageRank / OPIC family).
  * Everything is exact integer ppm arithmetic so a SQL oracle replays the
  * iteration bit-for-bit: no doubles, no convergence test — a FIXED
  * iteration count, the shape production crawl schedulers actually run
  * (rank stabilizes in a few passes and the scheduler wants bounded cost).
  *
  * Scale: the per-iteration work is one join of the rank frame against the
  * edge list on `src` plus one hash-agg on `dst` — both shuffles key on
  * node ids (longs). On a cluster, pre-partition edges and ranks by the
  * same key so every iteration reuses the co-partitioning; at web scale
  * this is exactly the Pregel/GraphX message shape without the framework.
  * The node-count normalizer rides the plan as a broadcast 1-row frame —
  * no driver job at construction (the operator stays a lazy plan builder).
  */
object LinkGraph {

  /** Fixed-iteration integer PageRank over a directed edge list.
    *
    * Self-loops are dropped and duplicate edges collapse (a multigraph
    * would double-count contributions); dangling nodes (no out-edges)
    * simply leak their mass — the standard simplification, documented
    * rather than patched, because crawl graphs prune dangling leaves
    * before ranking anyway.
    *
    * rank_0 = 10^6 DIV n per node; each iteration:
    * rank' = 150000 DIV n + 850 · Σ_in (rank_src DIV outdeg_src) DIV 1000
    * (damping 0.85 in ppm). Returns (node, rank_ppm), one row per node
    * that appears in any surviving edge.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nCnt = nodes.agg(count(lit(1)).as("n"))
    val r0 = nodes.crossJoin(broadcast(nCnt))
      .select(col("node"), expr("CAST(1000000 DIV n AS BIGINT)").as("r"))
    (1 to iters).foldLeft(r0) { (prev, _) =>
      val contribs = e.join(deg, "src")
        .join(prev.select(col("node").as("src"), col("r")), "src")
        .select(col("dst").as("node"), expr("r DIV deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("c"))
      nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(nCnt))
        .select(col("node"),
          expr("CAST(150000 DIV n + 850 * coalesce(c, 0L) DIV 1000 AS BIGINT)")
            .as("r"))
    }.select(col("node"), col("r").as("rank_ppm"))
  }
}
