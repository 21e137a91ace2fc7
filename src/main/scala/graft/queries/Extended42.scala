package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 42: four new operator classes — distributed
  * skyline (Pareto dominance), interval-union islands, hashing-trick
  * featurization, and deterministic random walks.
  */
object Extended42 {

  /** Local-then-global skyline: maximize both `qty` and `nparts`.
    * Within each `bucket`, a row survives iff no same-bucket row strictly
    * dominates it; the global pass (bucket = const) finishes the job on
    * the survivors. Dominance is transitive, so dropping locally-dominated
    * rows never removes a global-skyline member. Per bucket the filter is
    * two windows sharing ONE sort (qty desc): `m1` = best nparts among
    * strictly-greater qty (RANGE frame keyed on qty), `m2` = best nparts
    * at the same qty; survive iff nparts beats every greater-qty row and
    * matches the best of its own qty (equal points all survive). */
  private def skylineStage(df: DataFrame, bucket: Column): DataFrame = {
    val b = bucket.as("b")
    val withB = df.withColumn("b", b)
    val w1 = Window.partitionBy(col("b")).orderBy(col("qty").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy(col("b"), col("qty"))
    withB
      .withColumn("m1", max(col("nparts")).over(w1))
      .withColumn("m2", max(col("nparts")).over(w2))
      .where((col("m1").isNull || col("nparts") > col("m1")) &&
        col("nparts") === col("m2"))
      .drop("b", "m1", "m2")
  }

  /** W16 — distributed skyline (Pareto front; Börzsönyi et al. ICDE'01):
    * suppliers not strictly dominated on (total quantity shipped, distinct
    * parts carried), both maximized. The oracle is the textbook NOT EXISTS
    * dominance test (quadratic — fine at oracle scale); the Spark plan is
    * the two-stage distributed form: a per-bucket local skyline first
    * (window pair over one sort each), then the identical filter globally
    * over the survivors. Random 2-d data has O(log n)-sized skylines, so
    * the global stage sees ~buckets·log(n/buckets) rows — the
    * single-partition final window is deliberate and cheap, and the heavy
    * input never converges to one partition. Quantities are integer-valued
    * doubles, so the BIGINT cast is exact in both engines.
    *
    * Shape at scale: one keyed agg shuffle over lineitem, then windows
    * over supplier-sized data; local stage parallelism = bucket count. */
  val w16Skyline = q("w16_skyline",
    """WITH per AS (
      |  SELECT l_suppkey AS supp,
      |         CAST(sum(l_quantity) AS BIGINT) AS qty,
      |         count(DISTINCT l_partkey) AS nparts
      |  FROM lineitem GROUP BY 1)
      |SELECT p.supp, p.qty, p.nparts
      |FROM per p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM per o
      |  WHERE o.qty >= p.qty AND o.nparts >= p.nparts
      |    AND (o.qty > p.qty OR o.nparts > p.nparts))""".stripMargin) { (s, d) =>
    val per = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey").as("supp"))
      .agg(sum("l_quantity").cast("long").as("qty"),
        countDistinct("l_partkey").as("nparts"))
    val local = skylineStage(per, pmod(col("supp"), lit(16)))
    skylineStage(local, lit(0))
  }

  /** E41 — interval union (gaps-and-islands with VARIABLE-length
    * intervals): each event opens an interval of `value`·10 minutes;
    * overlapping-or-touching intervals per user merge into islands.
    * Unlike gap sessionization (e2 — fixed gap between POINTS), the
    * break test compares each start against the running MAX of all
    * previous interval ENDS — a long interval can bridge over a short
    * one that already ended, which lag()-based session logic gets wrong.
    * One sort per user serves both windows (running max, then the break
    * cumsum). All-integer µs arithmetic; the duration goes through
    * floor() because DuckDB's double→BIGINT cast rounds while Spark's
    * truncates.
    *
    * Shape at scale: single keyed shuffle; windows are O(1) state per
    * row; output is island-level (≤ input). */
  val e41IntervalMerge = q("e41_interval_merge",
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS s,
      |         epoch_us(ts::TIMESTAMP)
      |           + CAST(floor(value * 600000000) AS BIGINT) AS e
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, s, e,
      |         max(e) OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, s, e,
      |         CAST(sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC
      |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      |  FROM m)
      |SELECT user_id, island, min(s) AS start_us, max(e) AS end_us,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM isl GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val ord = Window.partitionBy("user_id")
      .orderBy(col("s").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          floor(col("value") * 600000000L).cast("long")).as("e"))
      .withColumn("pmax",
        max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        sum(when(col("pmax").isNull || col("s") > col("pmax"), 1)
          .otherwise(0)).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "island")
      .agg(min("s").as("start_us"), max("e").as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** T35 — hashing-trick featurization + linear quality score (the
    * fastText-classifier pattern behind DCLM/FineWeb-Edu curation):
    * unigram and bigram features hash into a 4096-bucket space (md5 →
    * top-8-hex → mod D, Weinberger et al. ICML'09), and the document
    * score is the mean feature weight under a deterministic weight table
    * (weight(b) = hash(b) mapped to [-1000, 1000]; a trained model would
    * broadcast the same-shape table — the plan is identical). Integer
    * weight sums are order-independent hence exact across engines; the
    * single final division of exact integers is bit-identical IEEE.
    *
    * Shape at scale: entirely array-local (transform/aggregate HOFs —
    * no explode, no shuffle, no UDF); the score is scan-side projection
    * so quality gating composes with pushdown. */
  val t35HashedFeatures = q("t35_hashed_features",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |         list_concat(
      |           list_transform(t, x ->
      |             ('0x' || substr(md5('f:' || x), 1, 8))::BIGINT % 4096),
      |           list_transform(t[2:], (y, i) ->
      |             ('0x' || substr(md5('f:' || t[CAST(i AS INT)] || '_' || y), 1, 8))::BIGINT % 4096)
      |         ) AS bk
      |  FROM tok)
      |SELECT doc_id,
      |       CAST(len(bk) AS BIGINT) AS n_feats,
      |       CAST(list_sum(list_transform(bk, b ->
      |         ('0x' || substr(md5('w:' || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000))
      |         AS BIGINT) AS raw,
      |       list_sum(list_transform(bk, b ->
      |         ('0x' || substr(md5('w:' || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000))
      |         / (1000.0 * len(bk)) AS score
      |FROM f WHERE len(bk) > 0""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(trim(col("text")), "\\s+"), x => x =!= "").as("t"))
    // md5 → top-8-hex → long via the codegen HexPrefixLong (identical
    // value to conv(substring(…),16,10), ~2× cheaper in the hot loop)
    val bucket = (sx: Column) =>
      graft.functions.HexPrefixLong(md5(concat(lit("f:"), sx)), 8) % 4096
    val f = toks.select(col("doc_id"),
      concat(
        transform(col("t"), x => bucket(x)),
        transform(slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (y, i) => bucket(concat(element_at(col("t"), i + 1), lit("_"), y)))
      ).as("bk"))
      // materialize ONCE: higher-order functions evaluate interpreted and
      // are excluded from codegen subexpression elimination, so after
      // projection collapse every downstream reference (size filter,
      // n_feats, raw, score) would re-run the whole hash build — 4× the
      // work. The checkpoint is a row-count-sized barrier (measured 3.5 s
      // → 1.3 s at sf0.1).
      .localCheckpoint(true)
    // the weight table is a deterministic function of the bucket index, so
    // it precomputes driver-side (same md5 the oracle evaluates per
    // feature) and ships as a 4096-long literal — O(1) array lookups
    // instead of a per-feature md5+conv chain (2× faster end-to-end)
    val wtab: Seq[Long] = (0 until 4096).map { b =>
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w:$b".getBytes("UTF-8"))
      val hex8 = dig.take(4).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex8, 16) % 2001 - 1000
    }
    val weightSum = aggregate(
      transform(col("bk"), b =>
        element_at(typedLit(wtab), (b + 1L).cast("int"))),
      lit(0L), (acc, x) => acc + x)
    f.where(size(col("bk")) > 0)
      .select(col("doc_id"),
        size(col("bk")).cast("long").as("n_feats"),
        weightSum.as("raw"),
        (weightSum / (lit(1000.0) * size(col("bk")))).as("score"))
  }

  /** G14 — deterministic random walks over the co-visitation graph
    * (the DeepWalk/node2vec corpus-generation step, made reproducible):
    * one walk starts at every node; at step k the walk at node u moves to
    * the neighbor ranked h(walk,k) mod degree(u) in u's sorted adjacency
    * — the hash replaces the RNG so both engines traverse identical
    * paths. Walks from isolated nodes emit only their step-0 row.
    *
    * Shape at scale: the ranked adjacency + degree tables build once
    * (checkpointed) and each of the 4 steps is one equi-join keyed on
    * (node, rank) — walk state is walk-count-sized, never corpus-sized,
    * and the step joins reuse the adjacency partitioning. */
  val g14RandomWalks = q("g14_random_walks", {
    val sb = new StringBuilder
    sb.append(
      s"""WITH ${Extended12.covisitCte},
         |edges AS (SELECT i1 AS src, i2 AS dst FROM pairs
         |          UNION ALL SELECT i2, i1 FROM pairs),
         |nodes AS (SELECT DISTINCT item AS node FROM it),
         |adj AS (SELECT src, dst,
         |               row_number() OVER (PARTITION BY src ORDER BY dst ASC) AS rk
         |        FROM edges),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
         |w0 AS (SELECT node AS walk_id, node, 0 AS step FROM nodes)""".stripMargin)
    for (k <- 1 to 4) sb.append(
      s""",
         |w$k AS (
         |  SELECT w.walk_id, a.dst AS node, $k AS step
         |  FROM w${k - 1} w
         |  JOIN deg g ON w.node = g.src
         |  JOIN adj a ON a.src = w.node
         |   AND a.rk = ('0x' || substr(md5('rw:' || CAST(w.walk_id AS VARCHAR) || ':' || $k), 1, 8))::BIGINT % g.d + 1)""".stripMargin)
    sb.append(
      """
        |SELECT walk_id, CAST(step AS INT) AS step, node FROM w0
        |UNION ALL SELECT walk_id, CAST(step AS INT), node FROM w1
        |UNION ALL SELECT walk_id, CAST(step AS INT), node FROM w2
        |UNION ALL SELECT walk_id, CAST(step AS INT), node FROM w3
        |UNION ALL SELECT walk_id, CAST(step AS INT), node FROM w4""".stripMargin)
    sb.toString
  }) { (s, d) =>
    withShufflePartitions(s, 8) {
      val (it, pairs) = Extended12.covisitGraph(s, d)
      val edges = pairs.select(col("i1").as("src"), col("i2").as("dst"))
        .unionAll(pairs.select(col("i2").as("src"), col("i1").as("dst")))
        .localCheckpoint(true)
      val nodes = it.select(col("item").as("node")).distinct()
      val adj = edges.withColumn("rk",
        row_number().over(Window.partitionBy("src").orderBy(col("dst").asc)))
      // degree is node-vocabulary-sized → broadcast; adjacency is
      // edge-sized → stays partitioned, stepped into by (node, rank)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      var state = nodes.select(col("node").as("walk_id"), col("node"),
        lit(0).as("step")).localCheckpoint(true)
      var out = state
      for (k <- 1 to 4) {
        val pick = conv(substring(
          md5(concat(lit("rw:"), col("walk_id").cast("string"), lit(s":$k"))),
          1, 8), 16, 10).cast("long") % col("d") + 1
        // checkpoint per step: each union branch would otherwise re-run
        // the whole join chain below it (k-deep lineage × 5 branches)
        state = state.select(col("walk_id"), col("node"))
          .join(broadcast(deg.withColumnRenamed("src", "node")), Seq("node"))
          .withColumn("rk", pick)
          .join(adj.withColumnRenamed("src", "node"), Seq("node", "rk"))
          .select(col("walk_id"), col("dst").as("node"), lit(k).as("step"))
          .localCheckpoint(true)
        out = out.unionByName(state)
      }
      out.select(col("walk_id"), col("step"), col("node"))
    }
  }

  val all: Seq[Q] = Seq(w16Skyline, e41IntervalMerge, t35HashedFeatures,
    g14RandomWalks)
}
