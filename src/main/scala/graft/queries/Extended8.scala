package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 8: weighted statistics, grouped mode,
  * symmetric difference with provenance, engagement stickiness
  * (DAU/WAU), and the label-centroid distance matrix.
  */
object Extended8 {

  /** A18 — weighted mean / variance per group (quantity-weighted price):
    * single-pass algebraic form (Σwx, Σwx², Σw) so the whole thing
    * partial-aggregates map-side — the two-pass textbook form would scan
    * twice for no accuracy the 2-dp rounding can see. */
  val a18WeightedStats = q("a18_weighted_stats",
    s"""SELECT l_returnflag,
       |       ${rnd("sum(l_quantity * l_extendedprice) / sum(l_quantity)", 2)} AS wmean,
       |       ${rnd("sum(l_quantity * l_extendedprice * l_extendedprice) / sum(l_quantity) - pow(sum(l_quantity * l_extendedprice) / sum(l_quantity), 2)", 2)} AS wvar
       |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    val swx = sum(col("l_quantity") * col("l_extendedprice"))
    val swx2 = sum(col("l_quantity") * col("l_extendedprice") * col("l_extendedprice"))
    val sw = sum(col("l_quantity"))
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(round(swx / sw, 2).as("wmean"),
        round(swx2 / sw - pow(swx / sw, 2), 2).as("wvar"))
  }

  /** A19 — statistical mode per group with a deterministic tie-break
    * (highest count, then lexicographic): counts then a rank-1 window —
    * the idiom that makes "most frequent value" reproducible across
    * engines and partitionings, unlike any_value/max_by ties. */
  val a19ModePerGroup = q("a19_mode_per_group",
    """SELECT o_orderstatus, o_orderpriority AS mode_priority,
      |       CAST(n AS BIGINT) AS n
      |FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |             row_number() OVER (PARTITION BY o_orderstatus
      |               ORDER BY count(*) DESC, o_orderpriority) AS rk
      |      FROM orders GROUP BY 1, 2)
      |WHERE rk = 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority"))
    Tables.orders(s, d).groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("n"))
  }

  /** U5 — symmetric difference with provenance: keys on exactly one side
    * (customers who ordered but aren't high-balance, and vice versa),
    * labeled with which side they came from — the reconciliation shape
    * j7 gives for full rows, here at key granularity via one full-outer
    * join of two pre-shrunk distinct sets. */
  val u5SymmetricDiff = q("u5_symmetric_diff",
    """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
      |SELECT coalesce(a.k, b.k) AS custkey,
      |       CASE WHEN b.k IS NULL THEN 'only_orders' ELSE 'only_highbal' END AS side
      |FROM a FULL OUTER JOIN b ON a.k = b.k
      |WHERE a.k IS NULL OR b.k IS NULL""".stripMargin) { (s, d) =>
    val a = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
    val b = Tables.customer(s, d).where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k"))
    a.as("a").join(b.as("b"), col("a.k") === col("b.k"), "full_outer")
      .where(col("a.k").isNull || col("b.k").isNull)
      .select(coalesce(col("a.k"), col("b.k")).as("custkey"),
        when(col("b.k").isNull, "only_orders").otherwise("only_highbal")
          .as("side"))
  }

  /** E27 — engagement stickiness: daily active users joined to their
    * week's weekly actives, DAU/WAU per day. Two exact distinct-count
    * aggregations at different grains (each one shuffle over (grain,
    * user) — swap in approx_count_distinct at 100 TB) and a broadcast
    * join of the tiny week table. */
  val e27DauWauStickiness = q("e27_dau_wau_stickiness",
    s"""WITH d AS (
       |  SELECT CAST(ts::TIMESTAMP AS DATE) AS day,
       |         date_trunc('week', CAST(ts::TIMESTAMP AS DATE)) AS wk,
       |         user_id
       |  FROM events),
       |dau AS (SELECT day, any_value(wk) AS wk, count(DISTINCT user_id) AS dau
       |        FROM d GROUP BY day),
       |wau AS (SELECT wk, count(DISTINCT user_id) AS wau FROM d GROUP BY 1)
       |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
       |       CAST(wau.wau AS BIGINT) AS wau,
       |       ${rnd("dau.dau / wau.wau", 6)} AS stickiness
       |FROM dau JOIN wau ON dau.wk = wau.wk""".stripMargin) { (s, d) =>
    val base = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"),
        date_trunc("week", to_date(col("ts"))).as("wk"), col("user_id"))
    val dau = base.groupBy("day")
      .agg(first("wk").as("wk"), countDistinct("user_id").as("dau"))
    val wau = base.groupBy("wk").agg(countDistinct("user_id").as("wau"))
    dau.join(broadcast(wau), "wk")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau"), 6).as("stickiness"))
  }

  /** V11 — label-centroid distance matrix: mean-pooled centroids (v6's
    * shape) self-joined on dimension to get pairwise L2 distances — the
    * "are my classes separable" screen. Everything after the one
    * explode-aggregate pass runs on labels×dims rows, which is tiny at
    * any corpus scale. */
  val v11CentroidDistances = q("v11_centroid_distances",
    s"""WITH v AS (
       |  SELECT label, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
       |c AS (SELECT label, i, avg(x) AS cx FROM v GROUP BY 1, 2)
       |SELECT CAST(a.label AS INT) AS l1, CAST(b.label AS INT) AS l2,
       |       ${rnd("sqrt(sum(pow(a.cx - b.cx, 2)))", 5)} AS dist
       |FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
       |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val c = Tables.embeddings(s, d)
      .select(col("label"), posexplode(graft.vec.Similarity.asDouble(col("embedding"))))
      .select(col("label"), (col("pos") + 1).as("i"), col("col").as("x"))
      .groupBy("label", "i").agg(avg("x").as("cx"))
    c.as("a").join(c.as("b"),
        col("a.i") === col("b.i") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").cast("int").as("l1"),
        col("b.label").cast("int").as("l2"))
      .agg(round(sqrt(sum(pow(col("a.cx") - col("b.cx"), 2))), 5).as("dist"))
  }

  /** W13 — running distinct count (cumulative unique items per user over
    * time): a first-seen flag (rank-1 per (user, item)) summed by an
    * ordered window — the exact streaming-compatible form of "how many
    * distinct things has this key touched so far", without any
    * set-valued state. Two windows over the same user partitioning, so
    * Spark plans ONE shuffle and reuses the sort. */
  val w13RunningDistinct = q("w13_running_distinct",
    """WITH x AS (
      |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS us,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS item
      |  FROM events),
      |f AS (
      |  SELECT event_id, user_id, us,
      |         CASE WHEN lag(item) OVER (PARTITION BY user_id
      |                ORDER BY item, us, event_id) IS DISTINCT FROM item
      |              THEN 1 ELSE 0 END AS first_seen
      |  FROM x)
      |SELECT event_id, user_id,
      |       CAST(sum(first_seen) OVER (PARTITION BY user_id
      |         ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |         AS distinct_items_so_far
      |FROM f""".stripMargin) { (s, d) =>
    // both windows partition by user_id (different sort orders): one
    // Exchange, two Sorts — a (user_id, item) first window would pay a
    // second shuffle for nothing
    val wFirst = Window.partitionBy("user_id")
      .orderBy(col("item"), col("us"), col("event_id"))
    val wRun = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevItem = lag("item", 1).over(wFirst)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .withColumn("first_seen",
        when(prevItem.isNull || prevItem =!= col("item"), 1).otherwise(0))
      .select(col("event_id"), col("user_id"),
        sum("first_seen").over(wRun).cast("long").as("distinct_items_so_far"))
  }

  /** E28 — fulfillment lag: days from order to FIRST ship across its
    * lines, aggregated per priority. The per-order min is a
    * partial-aggregable pre-shrink of the big side BEFORE the join —
    * at 100 TB you join 1 row per order, not every lineitem. */
  val e28FulfillmentLag = q("e28_fulfillment_lag",
    s"""WITH fs AS (
       |  SELECT l_orderkey, min(CAST(l_shipdate::TIMESTAMP AS DATE)) AS first_ship
       |  FROM lineitem GROUP BY 1),
       |lag_t AS (
       |  SELECT o.o_orderpriority,
       |         date_diff('day', CAST(o.o_orderdate::TIMESTAMP AS DATE), fs.first_ship) AS lag_days
       |  FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey)
       |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("avg(lag_days)", 4)} AS avg_lag_days,
       |       CAST(max(lag_days) AS BIGINT) AS max_lag_days
       |FROM lag_t GROUP BY 1""".stripMargin) { (s, d) =>
    val fs = Tables.lineitem(s, d)
      .groupBy("l_orderkey").agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    Tables.orders(s, d).join(fs, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("first_ship"), to_date(col("o_orderdate"))).as("lag_days"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(avg("lag_days"), 4).as("avg_lag_days"),
        max("lag_days").cast("long").as("max_lag_days"))
  }

  /** D8 — DEMO (16-bit): SimHash near-dup degree via pigeonhole nibble
    * banding. **Pedagogical fence, not a production path** — a 16-bit
    * signature gives 4-bit band keys → 16 buckets per band, so bucket
    * occupancy grows linearly with the corpus and candidate pairs
    * quadratically REGARDLESS of content (measured 53.8× work at 10×
    * corpus in BENCH.md). The production form of this exact plan is
    * [[Extended9.d14Simhash64Hamming]] (64-bit signature, 16-bit band
    * keys → 65 536 buckets/band, 1.3× at 10×); a guard below refuses
    * corpora past 10 000 docs so this demo cannot be shipped by
    * accident. Kept because the nibble pigeonhole (hamming ≤ 3 ⇒ some
    * nibble agrees) is the clearest statement of the banding idea. */
  val d8Simhash16Demo = q("d8_simhash16_demo",
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\s+'),
      |                                    x -> x <> '')) AS tk
      |  FROM documents),
      |bits AS (
      |  SELECT doc_id,
      |""".stripMargin +
    (0 until 16).map(b =>
      s"         sum(CASE WHEN substr(md5(tk), ${b + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n") +
    """
      |  FROM tok GROUP BY doc_id),
      |sig AS (SELECT doc_id, CAST(""".stripMargin +
    (0 until 16).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ") +
    """ AS BIGINT) AS sh FROM bits),
      |bands AS (
      |  SELECT doc_id, sh, b, (sh >> (4 * b)) & 15 AS key
      |  FROM sig CROSS JOIN range(0, 4) t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
      |p AS (
      |  SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
      |  FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3),
      |deg AS (
      |  SELECT id_a AS doc_id, hamming FROM p
      |  UNION ALL
      |  SELECT id_b AS doc_id, hamming FROM p)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_neighbors,
      |       CAST(min(hamming) AS INT) AS min_hamming
      |FROM deg GROUP BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // Demo fence: 16 buckets/band detonates quadratically on real corpora
    // (see scaladoc). Use d14_simhash64_hamming beyond toy scale. The
    // guard is LAZY — an assert_true over a limit-bounded count, cross-
    // joined onto the result — so plan-only consumers (explain, plan
    // audits) construct the DataFrame without triggering a job; the
    // fence fires on first execution.
    val guard = docs.select("doc_id").limit(10001)
      .agg(count(lit(1)).as("__n"))
      .select(assert_true(col("__n") <= 10000,
        lit("d8_simhash16_demo is a 16-bit teaching demo capped at 10000 " +
          "docs; use d14_simhash64_hamming for production corpora"))
        .as("__guard"))
    val toks = docs
      // single-row-group input (guide §2.5): spread the explode-heavy compute
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(graft.text.TextAnalysis.tokens(col("text"))).as("tk"))
    // materialized once: the band self-join otherwise re-runs the whole
    // signature pipeline on both sides (see d14)
    val sig = graft.text.NearDup.simhash16(toks, "doc_id", "tk")
      .select(col("doc_id"), col("simhash").as("sh")).localCheckpoint(true)
    val bands = sig.select(col("doc_id"), col("sh"),
      explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("key", expr("shiftright(sh, 4 * b) & 15"))
    val a = bands.select(col("b"), col("key"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = bands.select(col("b"), col("key"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val hamming = bit_count(col("sh_a").bitwiseXOR(col("sh_b")))
    // A pair agreeing on several nibbles matches in several bands; instead
    // of a DISTINCT (an extra shuffle of the full candidate set) emit it
    // exactly once — only from its FIRST agreeing band, a pure bitwise
    // predicate on the joined row. Pigeonhole guarantees hamming<=3 pairs
    // have an agreeing nibble, so the first-band rule loses nothing.
    val firstBand = expr(
      """CASE WHEN (sh_a ^ sh_b) & 15 = 0 THEN 0
        |     WHEN shiftright(sh_a ^ sh_b, 4) & 15 = 0 THEN 1
        |     WHEN shiftright(sh_a ^ sh_b, 8) & 15 = 0 THEN 2
        |     ELSE 3 END""".stripMargin)
    val pairs = a.join(b, Seq("b", "key"))
      .where(col("id_a") < col("id_b"))
      .where(hamming <= 3 && col("b") === firstBand)
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
    // both degree directions in ONE pass over the pair set — a union of
    // two selects would execute the whole band-join subtree twice
    pairs.select(explode(array(
        struct(col("id_a").as("doc_id"), col("hamming")),
        struct(col("id_b").as("doc_id"), col("hamming")))).as("e"))
      .select(col("e.doc_id").as("doc_id"), col("e.hamming").as("hamming"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_neighbors"),
        min("hamming").cast("int").as("min_hamming"))
      .crossJoin(broadcast(guard)).drop("__guard")
  }

  val all: Seq[Q] = Seq(a18WeightedStats, a19ModePerGroup, u5SymmetricDiff,
    e27DauWauStickiness, v11CentroidDistances, w13RunningDistinct,
    e28FulfillmentLag, d8Simhash16Demo)
}
