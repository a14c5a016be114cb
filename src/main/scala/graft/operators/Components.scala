package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the closure step every
  * near-dedup pipeline needs after pair generation: LSH/Jaccard emit PAIRS,
  * but survivorship must be decided per CLUSTER (a~b, b~c ⇒ {a,b,c} keep one
  * representative), and pairwise keep-the-smaller would over- or under-delete.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled with
  * its own id; each round a node adopts the minimum label among itself and
  * its neighbors; fixpoint = components labeled by their minimum member id.
  * Rounds needed = graph diameter (near-dup clusters are shallow — dozens of
  * members, diameter a handful), each round is one join + one min-aggregate,
  * both shuffling on the node id only. The edge set is persisted once and
  * reused every round. A driver-side convergence probe per round is O(1)
  * result rows (LIMIT 1 on changed labels) — the label sets themselves never
  * collect.
  *
  * At 100 TB scale the same loop holds: edges ≪ corpus (pairs only exist
  * where content overlaps), and the alternative single-pass formulations
  * (recursive closure, GraphX pregel) either blow up quadratically on big
  * components or add a dependency; bounded-round label propagation is the
  * standard Spark-native answer.
  */
object Components {

  /** @return (node, component_id) for every node appearing in `pairs`,
    *         component_id = minimum node id of the component. Deterministic.
    *         The result reads from the final round's local checkpoint.
    *         Throws if the label set has not converged after `maxIters`
    *         rounds (rounds needed = component diameter).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Each round's label set is localCheckpoint'ed (eager): the logical plan
    // would otherwise DOUBLE per round (labels feeds both the join and the
    // union branch — 2^rounds plan nodes, which blows up analysis long
    // before data does). Checkpointing truncates lineage to the materialized
    // blocks, keeps every round's plan constant-size, and lets old rounds'
    // storage be GC'd when their references drop — no cache juggling. On a
    // real cluster prefer reliable checkpoints (executor loss drops local
    // ones); the algorithm is unchanged.
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // Neighbors' labels flow along edges; the node's OWN previous label
      // rides along tagged (__own) so the convergence probe needs no join
      // against the previous round: after the min-aggregate, a row changed
      // iff min-over-all < min-over-own. One shuffle per round; the eager
      // checkpoint is the round's single materializing action.
      val prop = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("label"), lit(0).as("__own"))
        .union(labels.withColumn("__own", lit(1)))
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"),
          min(when(col("__own") === 1, col("label"))).as("__prev"))
        .localCheckpoint()
      val changed =
        prop.filter(col("label") < col("__prev")).limit(1).count() > 0L
      labels = prop.select(col("node"), col("label"))
      iters += 1
      converged = !changed
    }
    edges.unpersist()
    // Fail loudly rather than return silently split components: an
    // unconverged label set would make survivors() emit multiple
    // "representatives" per true cluster — a wrong deletion list. (Rounds
    // needed = graph diameter; raise maxIters for pathological chains.)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds — " +
      "component diameter exceeds maxIters; raise it (rounds = diameter)")
    labels.select(col("node"), col("label").as("component_id"))
  }

  /** Cluster survivors: one representative (min id) per component plus the
    * cluster size — the deletion list is every clustered node that is not its
    * component's representative.
    */
  def survivors(components: DataFrame): DataFrame =
    components.groupBy(col("component_id"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("component_id").as("survivor_id"), col("n_members"))
}
