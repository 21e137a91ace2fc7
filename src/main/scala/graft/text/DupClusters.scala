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

    // the iterative loop below is a chain of tiny 1-to-few-partition
    // shuffles; AQE's per-stage materialization adds a scheduling round
    // trip to each of them for zero re-planning benefit. Turn it off for
    // the duration of this operator (restored in the finally).
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {

    val (cpPairs, pairBlocks) = checkpoint(pairs.select("id_a", "id_b"))

    // size the loop's partitioning to the DUP GRAPH, not the corpus: the
    // graph inherits the corpus's partition count, so a small graph pays
    // full task-scheduling overhead on every one of O(diameter) rounds.
    // ~500k edges/partition keeps tasks meaningful; large graphs keep the
    // session's parallelism. (Sized from the pair count — half the edge
    // count — so the edge set is materialized exactly once, already
    // loop-partitioned.)
    val nPairs = cpPairs.count()
    val parts = math.max(1L, math.min(sc.defaultParallelism.toLong,
      2L * nPairs / 500000L + 1L)).toInt
    val edges = cpPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(cpPairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    val (cpEdges, edgeBlocks) = checkpoint(edges.repartition(parts, col("src")))
    free(pairBlocks)

    // only edge-touched nodes participate in propagation
    var (labels, labelBlocks) = checkpoint(
      cpEdges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("cluster_id"))
        .repartition(parts, col("id")))
    // convergence via the label-sum invariant: labels are per-id monotone
    // non-increasing, so Σcluster_id is strictly decreasing until the
    // fixpoint — equality ⟺ pointwise convergence. This rides the same
    // job as the label update (no separate changed-flag join). DECIMAL
    // accumulator: a 100 TB corpus has id sums far past long range.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head
        .getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    // one propagation step = min(own label, neighbors' labels): the
    // neighbor propagation joins labels to edges, and the union +
    // groupBy-min folds it into the node's own label — 2 shuffles/step
    def step(l: DataFrame): DataFrame = {
      val viaNeighbors = cpEdges
        .join(l.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("cluster_id"))
      l.unionByName(viaNeighbors)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
    }
    while (!converged && iter < maxIters) {
      // TWO steps per materialized round: on a latency-bound loop (the
      // dup graph is tiny next to the corpus) the cost driver is jobs
      // scheduled, not rows moved — one lazy checkpoint + one action
      // per double-step halves the round trips. Monotonicity makes the
      // convergence test exact either way: an unchanged sum over two
      // steps implies neither step changed anything.
      val (updated, newBlocks) = checkpoint(step(step(labels)), eager = false)
      val newSum = labelSum(updated)
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        System.err.println(s"[cc] iter=$iter sum=$newSum")
      free(labelBlocks)
      labels = updated
      labelBlocks = newBlocks
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    free(edgeBlocks)
    // singletons never entered the loop: label them with their own id.
    // (Result stays checkpoint-backed on the labels side; callers that
    // need the blocks released should materialize their own output. The
    // join itself runs lazily, after the finally restores AQE — only the
    // loop's fixed-size shuffles are pinned to non-adaptive planning.)
    nodes.select(col("id"))
      .join(labels.withColumnRenamed("id", "__eid")
        .withColumnRenamed("cluster_id", "__cid"),
        col("id") === col("__eid"), "left")
      .select(col("id"), coalesce(col("__cid"), col("id")).as("cluster_id"))

    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
