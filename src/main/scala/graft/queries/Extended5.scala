package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 5: temporal (SCD-2) dimension lookup, the
  * argmax/argmin aggregate family, a classifier confusion matrix, and
  * bitwise aggregates.
  */
object Extended5 {

  /** J11 — temporal dimension lookup against the j9 SCD-2 history: each
    * order's NEXT order (the fact) joined to the status row effective at
    * its date — equi-join on the entity key + validity-interval filter.
    * Per-entity history is short, so the right plan is the equi-join with
    * a residual range predicate (never an interval cross join); at 100 TB
    * the history table bucket-joins or broadcasts per AQE. Here the
    * "fact" probes are the orders themselves offset by one (lead),
    * proving each probe lands in exactly one validity window. */
  val j11TemporalLookup = q("j11_temporal_lookup",
    """WITH hist AS (
      |  SELECT o_custkey, o_orderkey, o_orderstatus,
      |         o_orderdate::TIMESTAMP AS eff_from,
      |         coalesce(lead(o_orderdate::TIMESTAMP) OVER (
      |           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      |           TIMESTAMP '9999-12-31') AS eff_to
      |  FROM orders),
      |probes AS (
      |  SELECT o_custkey, o_orderkey AS probe_key, o_orderdate::TIMESTAMP AS at_ts
      |  FROM orders)
      |SELECT p.probe_key, h.o_orderkey AS hist_key, h.o_orderstatus
      |FROM probes p JOIN hist h
      |  ON p.o_custkey = h.o_custkey
      | AND p.at_ts >= h.eff_from AND p.at_ts < h.eff_to""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val hist = o.select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
      col("o_orderdate").as("eff_from"),
      coalesce(lead("o_orderdate", 1).over(w),
        lit("9999-12-31").cast("timestamp")).as("eff_to"))
    val probes = o.select(col("o_custkey"), col("o_orderkey").as("probe_key"),
      col("o_orderdate").as("at_ts"))
    probes.join(hist, Seq("o_custkey"))
      .where(col("at_ts") >= col("eff_from") && col("at_ts") < col("eff_to"))
      .select(col("probe_key"), col("o_orderkey").as("hist_key"), col("o_orderstatus"))
  }

  /** A16 — argmax/argmin aggregates (max_by/min_by): "the id of the row
    * with the extreme value" without a self-join or window — single-pass,
    * partial-aggregable. Tie-free here: o_totalprice has no duplicates
    * within a status group at these scales is NOT guaranteed, so the
    * target is made unique by composing price with the orderkey. */
  val a16ArgmaxFamily = q("a16_argmax_family",
    s"""SELECT o_orderstatus,
       |       max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS top_order,
       |       min_by(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS bottom_order,
       |       ${rnd("max(o_totalprice)", 2)} AS top_price
       |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
    val target = col("o_totalprice") + col("o_orderkey") * 1e-9
    Tables.orders(s, d).groupBy("o_orderstatus")
      .agg(max_by(col("o_orderkey"), target).as("top_order"),
        min_by(col("o_orderkey"), target).as("bottom_order"),
        round(max("o_totalprice"), 2).as("top_price"))
  }

  /** T13 — classifier confusion matrix: the t1 language-ID predictions
    * cross-tabulated against the labeled `lang` column, with per-cell
    * counts and row share — the evaluation table every curation
    * classifier ships with. One aggregate; the matrix is |labels|² and
    * always tiny. */
  val t13ConfusionMatrix = q("t13_confusion_matrix",
    s"""WITH tok AS (
       |  SELECT doc_id, lang,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang,
       |         len(list_filter(t, x -> x IN ${TextQueries.markerSqlFor("sizish")})) AS s_sizish,
       |         len(list_filter(t, x -> x IN ${TextQueries.markerSqlFor("sqlish")})) AS s_sqlish,
       |         len(list_filter(t, x -> x IN ${TextQueries.markerSqlFor("storish")})) AS s_storish,
       |         len(list_filter(t, x -> x IN ${TextQueries.markerSqlFor("streamish")})) AS s_streamish
       |  FROM tok),
       |pred AS (
       |  SELECT lang AS actual,
       |         CASE WHEN s_sizish >= s_sqlish AND s_sizish >= s_storish AND s_sizish >= s_streamish THEN 'sizish'
       |              WHEN s_sqlish >= s_storish AND s_sqlish >= s_streamish THEN 'sqlish'
       |              WHEN s_storish >= s_streamish THEN 'storish'
       |              ELSE 'streamish' END AS predicted
       |  FROM scored)
       |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n,
       |       ${rnd("count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY actual)", 4)} AS row_share
       |FROM pred GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val scores = graft.text.TextAnalysis.langScores(col("text"), TextQueries.markers)
    val scored = Tables.documents(s, d)
      .select(col("lang").as("actual") +: scores.map { case (l, c) => c.as(s"s_$l") }: _*)
    // argmax with the same fixed priority order as t1 (alphabetical)
    val langs = TextQueries.markers.keys.toSeq.sorted
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((l, i), els) =>
      val cond = langs.drop(i + 1)
        .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(cond, lit(l)).otherwise(els)
    }
    val w = Window.partitionBy("actual")
    scored.select(col("actual"), pred.as("predicted"))
      .groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
      .withColumn("row_share",
        round(col("n") * 1.0 / sum("n").over(w), 4))
  }

  /** F26 — bitwise aggregate family (bit_and/bit_or/bit_xor + shifts):
    * the flag-mask rollup shape (permissions, feature flags, bloom-ish
    * membership unions) — partial-aggregable single pass. */
  val f26BitwiseAgg = q("f26_bitwise_agg",
    """SELECT l_returnflag,
      |       CAST(bit_and(l_orderkey % 256) AS BIGINT) AS and_mask,
      |       CAST(bit_or(l_orderkey % 256) AS BIGINT) AS or_mask,
      |       CAST(bit_xor(l_orderkey % 256) AS BIGINT) AS xor_mask,
      |       CAST(bit_or((l_linenumber % 8) << 4) AS BIGINT) AS shifted_or
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(bit_and(col("l_orderkey") % 256).as("and_mask"),
        bit_or(col("l_orderkey") % 256).as("or_mask"),
        bit_xor(col("l_orderkey") % 256).as("xor_mask"),
        bit_or(shiftleft(col("l_linenumber") % 8, 4)).as("shifted_or"))
  }

  /** D9 — train/test contamination check (decontamination): after the
    * deterministic hash split (t5), find test-split documents whose
    * normalized content hash also appears in the train split — the
    * exact-overlap leak report every benchmark-safe corpus release runs.
    * One shuffle on the 128-bit hash; the near-dup extension swaps the
    * hash for MinHash bands (d3) with identical shape. Exact-hash overlap
    * is rare by construction (the split is uniform over doc ids), so the
    * report also flags SHARED 3-SHINGLES — the n-gram-overlap screen
    * benchmark decontamination actually uses. */
  val d9Contamination = q("d9_contamination",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
      |              THEN 'test' ELSE 'train' END AS split
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, split,
      |         unnest(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |                ELSE list_transform(generate_series(1, len(t) - 2),
      |                                    i -> array_to_string(t[i:i+2], ' ')) END) AS g
      |  FROM tok),
      |train_grams AS (SELECT DISTINCT g FROM sh WHERE split = 'train')
      |SELECT s.doc_id AS test_doc_id,
      |       CAST(count(*) AS BIGINT) AS n_shingles,
      |       CAST(count(tg.g) AS BIGINT) AS n_shared,
      |       CAST(count(tg.g) * 1.0 / count(*) > 0.5 AS BOOLEAN) AS is_contaminated
      |FROM (SELECT DISTINCT doc_id, g FROM sh WHERE split = 'test') s
      |LEFT JOIN train_grams tg ON s.g = tg.g
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val split = when(substring(md5(col("doc_id").cast("string")), 1, 1)
      .isin("0", "1"), "test").otherwise("train")
    val grams = Tables.documents(s, d)
      // single-row-group input (guide §2.5): spread the explode-heavy compute
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split.as("split"),
        explode(graft.text.NearDup.shingles(col("text"), 3)).as("g"))
    val testGrams = grams.where(col("split") === "test")
      .select(col("doc_id").as("test_doc_id"), col("g")).distinct()
    val trainGrams = grams.where(col("split") === "train")
      .select("g").distinct().withColumn("hit", lit(1))
    testGrams.join(trainGrams, Seq("g"), "left")
      .groupBy("test_doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
      .select(col("test_doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared") * 1.0 / col("n_shingles") > 0.5).as("is_contaminated"))
  }

  /** T14 — per-source dedup-rate report: documents vs distinct normalized
    * contents per source — the corpus-health dashboard row. Map-side
    * partial on (source, hash), then a tiny per-source rollup. */
  val t14DupRateBySource = q("t14_dup_rate_by_source",
    s"""WITH hashed AS (
       |  SELECT source,
       |         md5(array_to_string(list_filter(string_split_regex(trim(text), '\\s+'),
       |                                         x -> x <> ''), ' ')) AS h
       |  FROM documents)
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
       |       ${rnd("1.0 - count(DISTINCT h) * 1.0 / count(*)", 4)} AS dup_rate
       |FROM hashed GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), graft.text.TextAnalysis.normalizedHash(col("text")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("h").as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct") * 1.0 / col("n_docs"), 4).as("dup_rate"))
  }

  /** E19 — z-score anomaly flags: events whose value sits > 3σ from the
    * event-type mean — the data-quality outlier pass. Two-phase: tiny
    * per-type stats (partial-aggregable), broadcast back over the fact
    * scan — the stats join never shuffles the facts at any scale. */
  val e19ZscoreAnomaly = q("e19_zscore_anomaly",
    s"""WITH stats AS (
       |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
       |  FROM events GROUP BY 1)
       |SELECT e.event_id, e.event_type,
       |       ${rnd("(e.value - s.mu) / s.sigma", 4)} AS zscore,
       |       CAST(abs((e.value - s.mu) / s.sigma) > 3.0 AS BOOLEAN) AS is_anomaly
       |FROM events e JOIN stats s ON e.event_type = s.event_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sigma"))
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("mu")) / col("sigma"), 4).as("zscore"),
        (abs((col("value") - col("mu")) / col("sigma")) > 3.0).as("is_anomaly"))
  }

  val all: Seq[Q] = Seq(j11TemporalLookup, a16ArgmaxFamily,
    t13ConfusionMatrix, f26BitwiseAgg, d9Contamination, t14DupRateBySource,
    e19ZscoreAnomaly)
}
