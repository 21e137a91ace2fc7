package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 45: incremental view maintenance, the k-NN
  * join, and KMV (k-minimum-values) sketch set operations.
  */
object Extended45 {

  /** C11 — incremental rollup maintenance (algebraic IVM): the per-
    * priority revenue rollup is kept as MERGEABLE partial state — the
    * base partition (orders before 1997) aggregates once and is then
    * combined with the delta partition's partial aggregate by pure state
    * merge (sum+sum, count+count, max+max) — no re-scan of the base.
    * The oracle states the flat GROUP BY over everything; equality IS
    * the algebraic-maintenance property. Money goes through exact cents
    * (floor(x·100 + 0.5) — both engines evaluate the identical double
    * expression) so the merged sums are order-independent integers.
    *
    * Shape at scale: this is the Delta/materialized-view pattern — the
    * base state is priority-cardinality-sized, the delta scan touches
    * only the new partition, and the merge is state-sized. The battery
    * form computes both sides in one plan; production would read the
    * base state from its sink. */
  val c11IncrementalRollup = q("c11_incremental_rollup",
    """WITH all_o AS (
      |  SELECT o_orderpriority AS pri,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |         o_orderdate
      |  FROM orders),
      |base AS (
      |  SELECT pri, sum(cents) AS s, CAST(count(*) AS BIGINT) AS c,
      |         max(o_orderdate) AS mx
      |  FROM all_o WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
      |delta AS (
      |  SELECT pri, sum(cents) AS s, CAST(count(*) AS BIGINT) AS c,
      |         max(o_orderdate) AS mx
      |  FROM all_o WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY 1),
      |merged AS (
      |  SELECT coalesce(b.pri, d.pri) AS pri,
      |         coalesce(b.s, 0) + coalesce(d.s, 0) AS s,
      |         coalesce(b.c, 0) + coalesce(d.c, 0) AS c,
      |         greatest(coalesce(b.mx, TIMESTAMP '1900-01-01'),
      |                  coalesce(d.mx, TIMESTAMP '1900-01-01')) AS mx
      |  FROM base b FULL OUTER JOIN delta d ON b.pri = d.pri)
      |SELECT pri, CAST(s AS BIGINT) AS total_cents, c AS n_orders,
      |       strftime(mx, '%Y-%m-%d') AS last_order
      |FROM merged""".stripMargin) { (s, d) =>
    val allO = Tables.orders(s, d).select(
      col("o_orderpriority").as("pri"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      col("o_orderdate"))
    def part(pred: Column) = allO.where(pred).groupBy("pri")
      .agg(sum("cents").as("s"), count(lit(1)).as("c"),
        max("o_orderdate").as("mx"))
    val cut = lit("1997-01-01").cast("timestamp")
    val base = part(col("o_orderdate") < cut)
    val delta = part(col("o_orderdate") >= cut)
    base.as("b").join(delta.as("d"), col("b.pri") === col("d.pri"), "full_outer")
      .select(
        coalesce(col("b.pri"), col("d.pri")).as("pri"),
        (coalesce(col("b.s"), lit(0L)) + coalesce(col("d.s"), lit(0L))).as("total_cents"),
        (coalesce(col("b.c"), lit(0L)) + coalesce(col("d.c"), lit(0L))).as("n_orders"),
        date_format(greatest(
          coalesce(col("b.mx"), lit("1900-01-01").cast("timestamp")),
          coalesce(col("d.mx"), lit("1900-01-01").cast("timestamp"))),
          "yyyy-MM-dd").as("last_order"))
  }

  /** V24 — k-NN JOIN (every vector → its 3 nearest same-cell neighbors):
    * the batch form of ANN search, where the query set IS the corpus.
    * Coarse IVF cells bound the candidate sets — the cell COUNT scales
    * as max(10, √n) with the corpus (the classic n^1.5 kNN-join bound;
    * a FIXED cell count would quietly degrade to corpus²/ncells, the
    * mis-sized-index regime) — pairs form CELL-LOCALLY, and
    * a per-query window keeps the top 3 by (distance, neighbor id) —
    * the canonical self-kNN used by SemDeDup-style pruning and graph-
    * index (kNN-graph) construction. The oracle replays cells, pairs,
    * and ranks with structurally identical float sums.
    *
    * Shape at scale: candidate pairs are Σ|cell|², never corpus² — the
    * cell key is the shuffle key; distances are array-local; the top-3
    * window shares the cell shuffle's partitioning (vec_id ⊂ cell
    * grouping isn't exploited by Catalyst, so the rank pays one more
    * keyed shuffle — acceptable; at billion scale the rank becomes a
    * bounded-heap per query inside the cell join). */
  val v24KnnJoin = q("v24_knn_join", {
    def sqSql(x: String, y: String) =
      s"""list_sum(list_transform(generate_series(1, 64),
         |  i -> (CAST($x[CAST(i AS INT)] AS DOUBLE) - CAST($y[CAST(i AS INT)] AS DOUBLE)) ^ 2))""".stripMargin
    s"""WITH nc AS (
       |  SELECT CAST(greatest(10, floor(sqrt(count(*)))) AS BIGINT) AS k
       |  FROM embeddings),
       |seeds AS (
       |  SELECT vec_id AS cid, embedding AS c FROM embeddings, nc
       |  WHERE vec_id < nc.k),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT e.vec_id, s.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${sqSql("e.embedding", "s.c")} ASC, s.cid ASC) AS rn
       |    FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
       |pairs AS (
       |  SELECT a.vec_id AS q, b.vec_id AS nb,
       |         ${sqSql("ea.embedding", "eb.embedding")} AS dist
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id)
       |SELECT q AS vec_id, CAST(rk AS INT) AS rank, nb AS neighbor_id,
       |       ${rnd("dist", 4)} AS dist
       |FROM (SELECT q, nb, dist,
       |             row_number() OVER (PARTITION BY q ORDER BY dist ASC, nb ASC) AS rk
       |      FROM pairs)
       |WHERE rk <= 3""".stripMargin
  }) { (s, d) =>
    def sq(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, z) => acc + z)
    val emb = Tables.embeddings(s, d)
      // single-row-group input (guide §2.5): the 64-dim distance compute
      // against every broadcast seed below otherwise runs on one task
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
    val nc = emb.agg(greatest(lit(10L),
      floor(sqrt(count(lit(1))))).cast("long").as("k"))
    val seeds = emb.crossJoin(broadcast(nc)).where(col("vec_id") < col("k"))
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val cells = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("v"), col("cid"), sq(col("v"), col("c")).as("fd"))
      .groupBy("vec_id")
      .agg(min(struct(col("fd"), col("cid"))).as("m"), first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), col("m.cid").as("cell"))
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("nb"),
        sq(col("a.v"), col("b.v")).as("dist"))
    pairs.withColumn("rank", row_number().over(
        Window.partitionBy("q").orderBy(col("dist").asc, col("nb").asc)))
      .where(col("rank") <= 3)
      .select(col("q").as("vec_id"), col("rank").cast("int").as("rank"),
        col("nb").as("neighbor_id"), round(col("dist"), 4).as("dist"))
  }

  /** A25 — KMV sketches + union distinct-count estimation (Beyer et al.
    * SIGMOD'07): each source's trigram-shingle universe (the resemblance
    * universe — raw vocab is too small to sketch) compresses to its k=64
    * MINIMUM md5-hash values — a deterministic, mergeable sketch — and
    * every source pair estimates |tokens(a) ∪ tokens(b)| as
    * (k−1)·2³²/h₍ₖ₎ of the MERGED sketch (union of two sorted hash sets,
    * k-th smallest). Both sketch and estimate are pure functions of the
    * data, so the oracle reproduces them EXACTLY — the sketch contract
    * itself is hash-checked, not just bounded. The exact union size
    * rides along for the error audit.
    *
    * Shape at scale: sketches build with one per-source bottom-k window
    * over distinct tokens (the groupBy collapses corpus-scale input to
    * vocab-scale); the pair stage touches only 20 sketches of 64 longs —
    * broadcast-sized state, quadratic only in #sources, never in data.
    * Exact-union audit joins two vocab-scale sets per pair. */
  val a25KmvUnion = q("a25_kmv_union",
    """WITH tok AS (
      |  SELECT source, list_filter(
      |           string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |tri AS (
      |  SELECT source, unnest(list_transform(generate_series(1, len(t) - 2),
      |           i -> t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)]
      |                || ' ' || t[CAST(i + 2 AS INT)])) AS w
      |  FROM tok WHERE len(t) >= 3),
      |h AS (
      |  SELECT DISTINCT source,
      |         ('0x' || substr(md5(w), 1, 8))::BIGINT AS hv
      |  FROM tri),
      |sk AS (
      |  SELECT source, hv,
      |         row_number() OVER (PARTITION BY source ORDER BY hv ASC) AS rk
      |  FROM h),
      |sketch AS (SELECT source, hv FROM sk WHERE rk <= 64),
      |pairs AS (
      |  SELECT a.source AS s1, b.source AS s2
      |  FROM (SELECT DISTINCT source FROM documents) a
      |  JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source),
      |kth AS (
      |  SELECT s1, s2, max(CASE WHEN rk = 64 THEN hv END) AS h64
      |  FROM (SELECT s1, s2, hv,
      |               row_number() OVER (PARTITION BY s1, s2 ORDER BY hv ASC) AS rk
      |        FROM (SELECT DISTINCT s1, s2, hv
      |              FROM (SELECT p.s1, p.s2, u.hv
      |                    FROM pairs p JOIN sketch u ON u.source IN (p.s1, p.s2))))
      |  GROUP BY 1, 2),
      |exact AS (
      |  SELECT p.s1, p.s2, CAST(count(DISTINCT h.hv) AS BIGINT) AS exact_union
      |  FROM pairs p JOIN h ON h.source IN (p.s1, p.s2)
      |  GROUP BY 1, 2)
      |SELECT e.s1, e.s2, e.exact_union,
      |       CAST(63 * 4294967296 // k.h64 AS BIGINT) AS kmv_estimate
      |FROM exact e JOIN kth k ON e.s1 = k.s1 AND e.s2 = k.s2""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      // single-row-group input (guide §2.5): spread the explode-heavy compute
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("source"),
        filter(split(trim(col("text")), "\\s+"), x => x =!= "").as("t"))
      .where(size(col("t")) >= 3)
      .select(col("source"), explode(transform(
        sequence(lit(1), size(col("t")) - 2),
        i => concat_ws(" ", element_at(col("t"), i),
          element_at(col("t"), i + 1), element_at(col("t"), i + 2)))).as("w"))
    val h = toks.select(col("source"),
        graft.functions.HexPrefixLong(md5(col("w")), 8).as("hv"))
      .distinct()
    val sketch = h.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("hv").asc)))
      .where(col("rk") <= 64).select("source", "hv")
      .localCheckpoint(true)
    val srcs = Tables.documents(s, d).select("source").distinct()
    val pairs = srcs.as("a").join(srcs.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("s1"), col("b.source").as("s2"))
    // OR-of-equalities would plan a BroadcastNestedLoopJoin; the two
    // sides are disjoint (s1 < s2), so a UNION of equi-joins is the
    // same rows through codegen'd broadcast-hash joins — this was the
    // a25 bimodality: the BNLJ amplified the corpus-scale hash set
    // 19x into one wide shuffle, swinging 2.7-8.9 s with memory
    // pressure
    def bySource(big: org.apache.spark.sql.DataFrame) =
      pairs.join(broadcast(big), col("source") === col("s1"))
        .select(col("s1"), col("s2"), col("hv"))
        .unionAll(pairs.join(broadcast(big), col("source") === col("s2"))
          .select(col("s1"), col("s2"), col("hv")))
    val merged = bySource(sketch).distinct()
    val kth = merged.withColumn("rk", row_number().over(
        Window.partitionBy("s1", "s2").orderBy(col("hv").asc)))
      .where(col("rk") === 64)
      .select(col("s1"), col("s2"), col("hv").as("h64"))
    val exact = h.join(broadcast(pairs), col("source") === col("s1"))
      .select(col("s1"), col("s2"), col("hv"))
      .unionAll(h.join(broadcast(pairs), col("source") === col("s2"))
        .select(col("s1"), col("s2"), col("hv")))
      .groupBy("s1", "s2").agg(countDistinct("hv").as("exact_union"))
    exact.join(kth, Seq("s1", "s2"))
      .select(col("s1"), col("s2"), col("exact_union"),
        expr("(63 * 4294967296L) div h64").as("kmv_estimate"))
  }

  val all: Seq[Q] = Seq(c11IncrementalRollup, v24KnnJoin, a25KmvUnion)
}
