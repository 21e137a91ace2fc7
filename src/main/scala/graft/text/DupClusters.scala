package graft.text

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
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
  * clusters, not social graphs), so diameter is small.
  *
  * The LOOP runs on co-partitioned RDDs, not DataFrames — the one place
  * in this engine where dropping below Catalyst is the right call
  * (GraphX makes the same one). A DataFrame loop pays full
  * analysis + optimization + whole-stage-codegen compilation per round
  * (measured ~1 s/round on a tiny graph — the plan build, not the data,
  * is the cost), and its growing lineage needs localCheckpoint
  * truncation. The RDD loop keys edges and labels with one shared
  * HashPartitioner: the edges⋈labels join is narrow (zero shuffle), the
  * min-reduce shuffles only the propagated messages — two bounded
  * shuffles per step and zero planning overhead.
  *
  * Scale shape:
  *  - the loop touches only edge-touched nodes. At 100 TB the dup graph
  *    is orders of magnitude smaller than the corpus; singletons (the
  *    vast majority) never enter a shuffle and are labeled with their own
  *    id by the final left join;
  *  - partitioning is sized to the DUP GRAPH, not the corpus (~500k
  *    edges/partition), so each of the O(diameter) rounds schedules a
  *    handful of tasks, not the corpus's partition count;
  *  - TWO propagation steps per materialized round: on a latency-bound
  *    loop the cost driver is jobs scheduled, not rows moved. The
  *    convergence test (Σ labels, monotone non-increasing, BigDecimal —
  *    id sums at 100 TB pass long range) is exact across a double step;
  *  - each round's labels are cached and the predecessor's blocks freed;
  *    lineage depth grows two narrow stages per round, irrelevant at
  *    dup-graph diameters.
  */
object DupClusters {

  /** @param nodes  one column `id` — every document (singletons keep
    *               their own id as cluster)
    * @param pairs  columns `id_a`, `id_b` — undirected near-dup edges
    * @return (id, cluster_id = min id in the connected component) */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._

    // one pass over the candidate-generation DAG (LSH banding upstream
    // would otherwise run once per direction)
    val undirected: RDD[(Long, Long)] = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].rdd
    // cached BEFORE the sizing count: the lineage above is the whole LSH
    // candidate-generation DAG, which must execute exactly once
    val edges0 = undirected
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }.cache()

    val nEdges = edges0.count()
    if (nEdges == 0) {
      edges0.unpersist(blocking = false)
      return nodes.select(col("id"), col("id").as("cluster_id"))
    }
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      nEdges / 500000L + 1L)).toInt
    val part = new HashPartitioner(parts)

    val edges = edges0.partitionBy(part).cache()
    var labels: RDD[(Long, Long)] = edges.keys.distinct(parts)
      .map(id => (id, id)).partitionBy(part).cache()
    labels.count() // materializes edges too; the raw pre-partition blocks can go
    edges0.unpersist(blocking = false)

    def step(l: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      // neighbors' labels keyed by destination, folded into own label;
      // edges⋈l is narrow (shared partitioner), the reduce shuffles only
      // the propagated (dst, label) messages back onto the same partitioner
      val prop = edges.join(l).map { case (_, (dst, lab)) => (dst, lab) }
      (l ++ prop).reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
    }
    def labelSum(l: RDD[(Long, Long)]): java.math.BigDecimal =
      l.aggregate(java.math.BigDecimal.ZERO)(
        (acc, kv) => acc.add(java.math.BigDecimal.valueOf(kv._2)),
        (a, b) => a.add(b))

    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val updated = step(step(labels)).cache()
      val newSum = labelSum(updated)
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        System.err.println(s"[cc] iter=$iter sum=$newSum")
      labels.unpersist(blocking = false)
      labels = updated
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    edges.unpersist(blocking = false)

    // singletons never entered the loop: label them with their own id.
    // (labels stays cached on the RDD side; callers that materialize
    // their output release it with the session's block cleanup.)
    val labeled = labels.toDF("__eid", "__cid")
    nodes.select(col("id"))
      .join(labeled, col("id") === col("__eid"), "left")
      .select(col("id"), coalesce(col("__cid"), col("id")).as("cluster_id"))
  }
}
