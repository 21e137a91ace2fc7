package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive near-duplicate clustering: connected components over the
  * candidate-pair graph, each document labeled with the minimum doc id of
  * its component (the canonical representative). Greedy pair-removal
  * (drop the higher id of each pair) breaks on chains a~b~c; components
  * don't.
  *
  * Implementation: iterative min-label propagation to fixpoint — each
  * round, every node takes min(own label, neighbors' labels); converges
  * in O(component diameter) rounds. Near-dup components are tiny (dup
  * clusters, not social graphs), so diameter is small; each round is one
  * join + one groupBy, all shuffle-partitioned on doc_id. (For adversarial
  * long-chain graphs the large-star/small-star variant halves diameters
  * per round; not needed for dedup workloads.)
  */
object DupClusters {

  /** @param nodes  one column `id` — every document (singletons keep
    *               their own id as cluster)
    * @param pairs  columns `id_a`, `id_b` — undirected near-dup edges
    * @return (id, cluster_id = min id in the connected component) */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    // undirected edge list, both directions. localCheckpoint truncates
    // lineage — iterative DataFrame loops otherwise nest the logical plan
    // exponentially (cache() short-circuits execution, NOT analysis) and
    // OOM the driver after a few dozen rounds.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // min label among each node's neighbors
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("cluster_id").as("n_min"))
      val updated = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val changed = updated.join(labels.withColumnRenamed("cluster_id", "old"), Seq("id"))
        .where(col("cluster_id") =!= col("old")).limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
