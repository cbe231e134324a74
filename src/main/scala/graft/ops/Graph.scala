package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the "last mile" of near-duplicate removal: candidate pairs (MinHash/
  * SimHash/embedding) form an undirected graph; each component keeps one
  * canonical document (its minimum id) and drops the rest.
  *
  * Each iteration is one equi-join + min-aggregation (both map-side
  * combinable), so a round costs O(|E|) shuffled bytes and the loop runs
  * `diameter` rounds — near-dup graphs are overwhelmingly tiny cliques, so
  * 2-3 rounds converge. The driver-side loop holds only the convergence
  * COUNT (a scalar per round), never data — the same legitimate iterative
  * shape as the k-means trainer. Deterministic: min() labels make the
  * result independent of partitioning and join order, so the whole
  * computation is reproducible in a DuckDB recursive CTE.
  */
object Graph {

  /** Component label (= minimum reachable id) for every vertex of `edges`
    * (columns `src`, `dst`; undirected). Vertices only appear if they have
    * at least one edge — isolated documents are their own keeper by
    * definition and never enter the graph.
    *
    * Every round's result is `localCheckpoint`ed (eager): a persist alone
    * truncates RE-COMPUTATION but not the LOGICAL plan, and each round
    * references the previous one several times, so the un-checkpointed
    * plan tree grows exponentially with iterations (the standard failure
    * mode of iterative DataFrame algorithms; driver OOMs stringifying the
    * plan long before any data moves). On a cluster with an unreliable-
    * executor concern, swap for reliable `checkpoint()` on a checkpoint
    * dir — same lineage cut. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // checkpoint the edge list before symmetrizing: the union references it
    // twice, and the caller's edge plan (an LSH candidate generation, say)
    // is usually the most expensive subtree in sight
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val sym = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true)
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        // min label among each vertex's neighbors; the change flag rides
        // along into the checkpoint so convergence detection is a filter
        // over already-materialized blocks, not another join over labels
        val neighborMin = sym
          .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min(col("label")).as("nlabel"))
        val updated = labels
          .join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("new_label"),
            coalesce(col("nlabel") < col("label"), lit(false)).as("chg"))
          .localCheckpoint(true)
        labels = updated.select(col("id"), col("new_label").as("label"))
        converged = updated.filter(col("chg")).isEmpty
        i += 1
      }
      // an unconverged result is silently WRONG (multiple keepers inside
      // one duplicate cluster) — fail loudly instead
      if (!converged) throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter iterations — " +
          "a component's diameter exceeds maxIter; raise it")
      labels
    } finally sym.unpersist()
  }
}
