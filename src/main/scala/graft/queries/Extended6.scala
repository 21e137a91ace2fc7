package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 6: conditional-expression family,
  * schema-evolution union, and RFM user segmentation.
  */
object Extended6 {

  /** F28 — conditional expression family: nullif / ifnull / greatest /
    * least / multi-way coalesce — the null-plumbing idioms the
    * reference's `int(x or 0)` guards (dataprocessing3.py:50-55) become
    * under a typed engine. All scan-side codegen. */
  val f28ConditionalFamily = q("f28_conditional_family",
    s"""SELECT c_custkey,
       |       ${rnd("nullif(c_acctbal, 0.0)", 2)} AS bal_nz,
       |       ${rnd("ifnull(nullif(c_acctbal, 0.0), -1.0)", 2)} AS bal_dflt,
       |       ${rnd("greatest(c_acctbal, 0.0)", 2)} AS bal_floor,
       |       ${rnd("least(c_acctbal, 1000.0)", 2)} AS bal_cap,
       |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_mapped
       |FROM customer""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_custkey"),
      round(nullif(col("c_acctbal"), lit(0.0)), 2).as("bal_nz"),
      round(coalesce(nullif(col("c_acctbal"), lit(0.0)), lit(-1.0)), 2).as("bal_dflt"),
      round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor"),
      round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
        .as("seg_mapped"))
  }

  /** U4 — schema-evolution union (unionByName with missing columns):
    * two extracts of the same entity with drifted schemas combined by
    * NAME, absent columns null-filled — the append path every long-lived
    * warehouse needs when v2 of a feed adds a column. */
  val u4SchemaEvolutionUnion = q("u4_schema_evolution_union",
    s"""SELECT o_orderkey, o_orderstatus, o_totalprice, NULL AS o_orderpriority
       |FROM orders WHERE o_orderkey % 5 = 0
       |UNION ALL BY NAME
       |SELECT o_orderkey, o_orderstatus, o_orderpriority,
       |       ${rnd("o_totalprice * 1.1", 2)} AS o_totalprice
       |FROM orders WHERE o_orderkey % 5 = 1""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val v1 = o.where(col("o_orderkey") % 5 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val v2 = o.where(col("o_orderkey") % 5 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        round(col("o_totalprice") * 1.1, 2).as("o_totalprice"))
    v1.unionByName(v2, allowMissingColumns = true)
  }

  /** G4 — RFM segmentation: each user scored by recency (last event),
    * frequency (event count), monetary (purchase value sum) terciles,
    * combined into the classic "R F M" segment code. Three metrics in
    * ONE aggregate pass, then three cheap ntile windows over the tiny
    * per-user table — the fact table is scanned exactly once. */
  val g4RfmSegmentation = q("g4_rfm_segmentation",
    """WITH m AS (
      |  SELECT user_id,
      |         max(epoch_us(ts::TIMESTAMP)) AS last_us,
      |         count(*) AS freq,
      |         coalesce(sum(value) FILTER (event_type = 'purchase'), 0.0) AS monetary
      |  FROM events GROUP BY 1),
      |scored AS (
      |  SELECT user_id,
      |         ntile(3) OVER (ORDER BY last_us DESC, user_id ASC) AS r,
      |         ntile(3) OVER (ORDER BY freq DESC, user_id ASC) AS f,
      |         ntile(3) OVER (ORDER BY monetary DESC, user_id ASC) AS mo
      |  FROM m)
      |SELECT user_id, CAST(r AS INT) AS r, CAST(f AS INT) AS f,
      |       CAST(mo AS INT) AS m,
      |       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(mo AS VARCHAR) AS segment
      |FROM scored""".stripMargin) { (s, d) =>
    val m = Tables.events(s, d).groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        coalesce(sum(when(col("event_type") === "purchase", col("value"))),
          lit(0.0)).as("monetary"))
    val r = ntile(3).over(Window.orderBy(col("last_us").desc, col("user_id").asc))
    val f = ntile(3).over(Window.orderBy(col("freq").desc, col("user_id").asc))
    val mo = ntile(3).over(Window.orderBy(col("monetary").desc, col("user_id").asc))
    m.select(col("user_id"), r.as("r"), f.as("f"), mo.as("m"))
      .select(col("user_id"), col("r"), col("f"), col("m"),
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")).as("segment"))
  }

  private def toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")

  private val tokCte =
    """  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents""".stripMargin

  /** T15 — TF-IDF: the classic relevance weight, computed as three
    * partial-aggregable passes — (doc,token) term counts, token document
    * frequency, corpus size — joined back and combined scan-side. Both
    * aggregations get map-side combine; the 1-row corpus count is
    * broadcast. Token skew (stopwords) is absorbed by partial aggregation,
    * not a hot reducer. */
  val t15Tfidf = q("t15_tfidf",
    s"""WITH tok AS (
       |$tokCte),
       |tf AS (SELECT doc_id, len(t) AS dlen, unnest(t) AS token FROM tok),
       |c AS (SELECT doc_id, token, any_value(dlen) AS dlen, count(*) AS tf
       |      FROM tf GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM c GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents)
       |SELECT c.doc_id, c.token, CAST(c.tf AS BIGINT) AS tf,
       |       CAST(df.df AS BIGINT) AS df,
       |       ${rnd("(c.tf / c.dlen) * ln(n.n / df.df)", 6)} AS tfidf
       |FROM c JOIN df ON c.token = df.token CROSS JOIN n""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val c = docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), size(col("t")).as("dlen"), explode(col("t")).as("token"))
      .groupBy("doc_id", "token")
      .agg(first("dlen").as("dlen"), count(lit(1)).as("tf"))
    val dfreq = c.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    c.join(dfreq, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round((col("tf") / col("dlen")) * log(col("n") / col("df")), 6).as("tfidf"))
  }

  /** T16 — skip-gram pair extraction (offsets 1 and 2), the co-occurrence
    * statistic embedding training feeds on. Pairs are generated
    * ARRAY-LOCALLY (transform over positions) — no positional self-join,
    * so the only shuffle is the final pair-count aggregation, and the
    * work per document is linear in its token count. */
  val t16Skipgrams = q("t16_skipgrams",
    s"""WITH tok AS (
       |$tokCte),
       |p AS (
       |  SELECT unnest(list_concat(
       |    CASE WHEN len(t) < 2 THEN []::VARCHAR[]
       |         ELSE list_transform(generate_series(1, len(t) - 1),
       |                             i -> t[i] || ' ' || t[i + 1]) END,
       |    CASE WHEN len(t) < 3 THEN []::VARCHAR[]
       |         ELSE list_transform(generate_series(1, len(t) - 2),
       |                             i -> t[i] || ' ' || t[i + 2]) END)) AS pair
       |  FROM tok)
       |SELECT pair, CAST(count(*) AS BIGINT) AS n
       |FROM p GROUP BY 1 HAVING count(*) >= 5""".stripMargin) { (s, d) =>
    def grams(off: Int) =
      when(size(col("t")) <= off, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(col("t")) - off),
          i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + off))))
    Tables.documents(s, d).select(toks.as("t"))
      .select(explode(concat(grams(1), grams(2))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .where(col("n") >= 5)
  }

  /** T18 — inverted index build: token → document frequency + the head of
    * the sorted posting list. Distinct (token, doc) pairs aggregate with
    * map-side combine; posting lists are truncated to 5 AFTER a numeric
    * sort so the output is deterministic and bounded per token even when
    * a stopword matches every document in the corpus. */
  val t18InvertedIndex = q("t18_inverted_index",
    s"""WITH tok AS (
       |$tokCte),
       |w AS (SELECT DISTINCT doc_id, unnest(t) AS token FROM tok)
       |SELECT token, CAST(count(*) AS BIGINT) AS df,
       |       array_to_string(list_transform(list_sort(list(doc_id))[1:5],
       |                                      v -> CAST(v AS VARCHAR)), ',') AS posting_head
       |FROM w GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("token"))
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        concat_ws(",", transform(slice(array_sort(collect_list(col("doc_id"))), 1, 5),
          v => v.cast("string"))).as("posting_head"))
  }

  /** F29 — map-type function family: per-document term-frequency MAP built
    * scan-locally (map_from_entries over the distinct-token array), probed
    * with element_at, filtered with map_filter — zero shuffles, the whole
    * row stays inside whole-stage codegen. The oracle states the same
    * semantics relationally (DuckDB's map surface differs). */
  val f29MapKitchen = q("f29_map_kitchen",
    s"""WITH tok AS (
       |$tokCte),
       |w AS (SELECT doc_id, unnest(t) AS token FROM tok),
       |c AS (SELECT doc_id, token, count(*) AS n FROM w GROUP BY 1, 2),
       |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS vocab,
       |             CAST(count(*) FILTER (n > 1) AS BIGINT) AS n_rep,
       |             CAST(coalesce(sum(n) FILTER (token = 'the'), 0) AS BIGINT) AS the_n
       |      FROM c GROUP BY 1)
       |SELECT d.doc_id, coalesce(g.vocab, 0) AS vocab,
       |       coalesce(g.n_rep, 0) AS n_rep, coalesce(g.the_n, 0) AS the_n
       |FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id""".stripMargin) { (s, d) =>
    val t = toks
    val m = map_from_entries(transform(array_distinct(t),
      w => struct(w, size(filter(t, x => x === w)).cast("long"))))
    Tables.documents(s, d).select(col("doc_id"), m.as("m"))
      .select(col("doc_id"),
        size(map_keys(col("m"))).cast("long").as("vocab"),
        size(map_filter(col("m"), (_, v) => v > 1)).cast("long").as("n_rep"),
        coalesce(element_at(col("m"), "the"), lit(0L)).as("the_n"))
  }

  /** F30 — array set-operation family (intersect / except / union /
    * overlap) of each document's distinct-token array against a literal
    * stop-list: the membership calculus of token-level filtering, all
    * scan-side with no shuffle. Sizes, not arrays, are output so the
    * comparison is element-order-independent. */
  val f30ArraySetops = q("f30_array_setops",
    s"""WITH tok AS (
       |$tokCte),
       |a AS (SELECT doc_id, list_distinct(t) AS a,
       |             ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'] AS st
       |      FROM tok)
       |SELECT doc_id,
       |       CAST(len(list_filter(a, x -> list_contains(st, x))) AS INT) AS n_common,
       |       CAST(len(list_filter(a, x -> NOT list_contains(st, x))) AS INT) AS n_only,
       |       CAST(len(list_distinct(list_concat(a, st))) AS INT) AS n_union,
       |       len(list_filter(a, x -> list_contains(st, x))) > 0 AS has_stop
       |FROM a""".stripMargin) { (s, d) =>
    val st = array(Seq("the", "a", "of", "and", "to", "in", "is", "it").map(lit): _*)
    Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(toks).as("a"), st.as("st"))
      .select(col("doc_id"),
        size(array_intersect(col("a"), col("st"))).as("n_common"),
        size(array_except(col("a"), col("st"))).as("n_only"),
        size(array_union(col("a"), col("st"))).as("n_union"),
        arrays_overlap(col("a"), col("st")).as("has_stop"))
  }

  /** T17 — class-balance report with Shannon entropy contribution: the
    * label-distribution audit run before any training job. One grouped
    * count (map-side combined), then the share/entropy math over the
    * few-row language table — the unbounded window is fine precisely
    * because it runs on the aggregate, never the corpus. */
  val t17LabelEntropy = q("t17_label_entropy",
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1)
       |SELECT lang, CAST(n AS BIGINT) AS n,
       |       ${rnd("n / sum(n) OVER ()", 6)} AS share,
       |       ${rnd("-(n / sum(n) OVER ()) * log2(n / sum(n) OVER ())", 6)} AS bits
       |FROM c""".stripMargin) { (s, d) =>
    val w = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documents(s, d).groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), col("n"),
        round(col("n") / sum("n").over(w), 6).as("share"),
        round(-(col("n") / sum("n").over(w)) * log2(col("n") / sum("n").over(w)), 6)
          .as("bits"))
  }

  /** T19 — intra-document repetition filters (the Gopher-rule family):
    * duplicate-bigram fraction and top-bigram mass, with a keep flag at
    * the published 0.2/0.1 style thresholds. Entirely array-local per
    * row — zero shuffles, linear scan; the O(u²) distinct-count inner
    * loop is bounded by per-document vocabulary, not corpus size. */
  val t19RepetitionFilters = q("t19_repetition_filters",
    s"""WITH tok AS (
       |$tokCte),
       |b AS (
       |  SELECT doc_id,
       |         CASE WHEN len(t) < 2 THEN []::VARCHAR[]
       |              ELSE list_transform(generate_series(1, len(t) - 1),
       |                                  i -> t[i] || ' ' || t[i + 1]) END AS b
       |  FROM tok)
       |SELECT doc_id, CAST(len(b) AS BIGINT) AS n_bi,
       |       ${rnd("(len(b) - len(list_distinct(b))) / nullif(len(b), 0)", 6)} AS dup_frac,
       |       ${rnd("list_max(list_transform(list_distinct(b), g -> len(list_filter(b, x -> x = g)))) / nullif(len(b), 0)", 6)} AS top_frac,
       |       (len(b) - len(list_distinct(b))) / nullif(len(b), 0) <= 0.2
       |         AND list_max(list_transform(list_distinct(b),
       |               g -> len(list_filter(b, x -> x = g)))) / nullif(len(b), 0) <= 0.1
       |         AS keep
       |FROM b""".stripMargin) { (s, d) =>
    val bi = when(size(col("t")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1))))
    val nb = size(col("b"))
    val dupFrac = (nb - size(array_distinct(col("b")))) / nullif(nb, lit(0))
    val topFrac = array_max(transform(array_distinct(col("b")),
      g => size(filter(col("b"), x => x === g)))) / nullif(nb, lit(0))
    Tables.documents(s, d).select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), bi.as("b"))
      .select(col("doc_id"), nb.cast("long").as("n_bi"),
        round(dupFrac, 6).as("dup_frac"), round(topFrac, 6).as("top_frac"),
        (dupFrac <= 0.2 && topFrac <= 0.1).as("keep"))
  }

  /** T20 — sequence packing: stream documents per source in doc_id order
    * into fixed 1000-token bins (bin id + intra-bin offset from an
    * EXCLUSIVE running sum). The window partitions by source, so state
    * per task is one running counter and packing parallelizes across
    * sources/shards at 100 TB — integer math only, no FP drift. */
  val t20SequencePacking = q("t20_sequence_packing",
    """WITH n AS (
      |  SELECT doc_id, source,
      |         len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS n_tok
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source, n_tok,
      |         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumx
      |  FROM n)
      |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
      |       CAST(cumx // 1000 AS BIGINT) AS bin,
      |       CAST(cumx % 1000 AS BIGINT) AS off
      |FROM p""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), size(toks).cast("long").as("n_tok"))
      .withColumn("cumx", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tok"),
        expr("cumx div 1000").as("bin"), (col("cumx") % 1000).as("off"))
  }

  /** E21 — robust outlier flags via median/MAD (the skew-immune z-score):
    * two exact-percentile grouped passes over the fact, each joined back
    * by BROADCAST (the per-type stats table is tiny), so the fact is
    * scanned, never shuffled. At 100 TB swap `percentile` for the
    * approx_percentile sketch — same plan shape. */
  val e21MadOutliers = q("e21_mad_outliers",
    s"""WITH med AS (
       |  SELECT event_type, quantile_cont(value, 0.5) AS med
       |  FROM events GROUP BY 1),
       |mad AS (
       |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
       |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
       |SELECT e.event_id, e.event_type,
       |       ${rnd("0.6745 * (e.value - m.med) / nullif(d.mad, 0)", 5)} AS robust_z,
       |       abs(0.6745 * (e.value - m.med) / nullif(d.mad, 0)) > 3.5 AS is_outlier
       |FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val med = e.groupBy("event_type").agg(expr("percentile(value, 0.5D)").as("med"))
    val mad = e.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
    val z = lit(0.6745) * (col("value") - col("med")) / nullif(col("mad"), lit(0.0))
    e.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .select(col("event_id"), col("event_type"),
        round(z, 5).as("robust_z"), (abs(z) > 3.5).as("is_outlier"))
  }

  /** V9 — per-label feature scaling: min-max normalization and
    * standardization of a projected embedding coordinate against
    * label-level stats. One partial-aggregable stats pass, broadcast
    * back over the corpus scan — the normalize step every feature
    * pipeline runs before training. */
  val v9FeatureScaling = q("v9_feature_scaling",
    s"""WITH v AS (
       |  SELECT vec_id, label, CAST(embedding[1] AS DOUBLE) AS c1 FROM embeddings),
       |st AS (
       |  SELECT label, min(c1) AS mn, max(c1) AS mx,
       |         avg(c1) AS av, stddev_samp(c1) AS sd
       |  FROM v GROUP BY 1)
       |SELECT v.vec_id, v.label,
       |       ${rnd("(v.c1 - st.mn) / nullif(st.mx - st.mn, 0)", 6)} AS minmax,
       |       ${rnd("(v.c1 - st.av) / nullif(st.sd, 0)", 6)} AS zscore
       |FROM v JOIN st USING (label)""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        element_at(col("embedding"), 1).cast("double").as("c1"))
    val st = v.groupBy("label").agg(min("c1").as("mn"), max("c1").as("mx"),
      avg("c1").as("av"), stddev_samp("c1").as("sd"))
    v.join(broadcast(st), "label")
      .select(col("vec_id"), col("label"),
        round((col("c1") - col("mn")) / nullif(col("mx") - col("mn"), lit(0.0)), 6)
          .as("minmax"),
        round((col("c1") - col("av")) / nullif(col("sd"), lit(0.0)), 6).as("zscore"))
  }

  val all: Seq[Q] = Seq(f28ConditionalFamily, u4SchemaEvolutionUnion,
    g4RfmSegmentation, t15Tfidf, t16Skipgrams, t18InvertedIndex,
    f29MapKitchen, f30ArraySetops, t17LabelEntropy, t19RepetitionFilters,
    t20SequencePacking, e21MadOutliers, v9FeatureScaling)
}
