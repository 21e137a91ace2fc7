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
  * join + one groupBy, all shuffle-partitioned on doc_id.
  *
  * Scale shape:
  *  - `pairs` is materialized ONCE (localCheckpoint) before fan-out into
  *    both edge directions — the candidate-generation DAG upstream (LSH
  *    banding over the full corpus) would otherwise execute twice;
  *  - the loop runs only over nodes that touch an edge. At 100 TB the dup
  *    graph is orders of magnitude smaller than the corpus; singletons
  *    (the vast majority) never enter a shuffle and are labeled with
  *    their own id by a final left join;
  *  - convergence detection rides the same materialization as the label
  *    update (a `changed` flag summed over the checkpointed result), so
  *    each round costs exactly one compute job + one cheap agg job;
  *  - lineage is truncated per round (localCheckpoint) — iterative
  *    DataFrame loops otherwise nest the logical plan exponentially
  *    (cache() short-circuits execution, NOT analysis) — and each round's
  *    blocks are dropped once the next round is materialized.
  */
object DupClusters {

  /** @param nodes  one column `id` — every document (singletons keep
    *               their own id as cluster)
    * @param pairs  columns `id_a`, `id_b` — undirected near-dup edges
    * @return (id, cluster_id = min id in the connected component) */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    val sc = spark.sparkContext

    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val preexisting = persistedIds
    // checkpoint-and-track: returns the materialized frame plus the ids of
    // the RDD blocks it pinned, so a round can free its predecessor
    def checkpoint(df: DataFrame, eager: Boolean = true): (DataFrame, Set[Int]) = {
      val before = persistedIds
      val cp = df.localCheckpoint(eager)
      (cp, persistedIds -- before -- preexisting)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(i => sc.getPersistentRDDs.get(i).foreach(_.unpersist(false)))

    val (cpPairs, pairBlocks) = checkpoint(pairs.select("id_a", "id_b"))
    val edges = cpPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(cpPairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    val (cpEdges0, edgeBlocks0) = checkpoint(edges)
    free(pairBlocks)

    // size the loop's partitioning to the DUP GRAPH, not the corpus: the
    // graph inherits the corpus's partition count, so a small graph pays
    // full task-scheduling overhead on every one of O(diameter) rounds.
    // ~500k edges/partition keeps tasks meaningful; large graphs keep the
    // session's parallelism.
    val nEdges = cpEdges0.count()
    val parts = math.max(1L, math.min(sc.defaultParallelism.toLong,
      nEdges / 500000L + 1L)).toInt
    val (cpEdges, edgeBlocks) =
      if (parts < cpEdges0.rdd.getNumPartitions) {
        val r = checkpoint(cpEdges0.repartition(parts, col("src")))
        free(edgeBlocks0); r
      } else (cpEdges0, edgeBlocks0)

    // only edge-touched nodes participate in propagation
    var (labels, labelBlocks) = checkpoint(
      cpEdges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("cluster_id"))
        .repartition(parts, col("id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaNeighbors = cpEdges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("cluster_id").as("n_min"))
      // lazy checkpoint: the convergence agg below is the materializing
      // action, so each round costs exactly ONE job
      val (updated, newBlocks) = checkpoint(
        labels.join(viaNeighbors, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
              .as("cluster_id"),
            (coalesce(col("n_min"), col("cluster_id")) < col("cluster_id"))
              .cast("long").as("changed")),
        eager = false)
      val changed = updated.agg(sum("changed")).head.getLong(0)
      free(labelBlocks)
      labels = updated.drop("changed")
      labelBlocks = newBlocks
      converged = changed == 0L
      iter += 1
    }
    free(edgeBlocks)
    // singletons never entered the loop: label them with their own id.
    // (Result stays checkpoint-backed on the labels side; callers that
    // need the blocks released should materialize their own output.)
    nodes.select(col("id"))
      .join(labels.withColumnRenamed("id", "__eid")
        .withColumnRenamed("cluster_id", "__cid"),
        col("id") === col("__eid"), "left")
      .select(col("id"), coalesce(col("__cid"), col("id")).as("cluster_id"))
  }
}
