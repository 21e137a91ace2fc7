package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 11: span-level duplication measurement, PMI
  * collocation mining, and exact-arithmetic trend fitting.
  */
object Extended11 {

  private val tokCte =
    """  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents""".stripMargin

  /** D16 — repeated cross-document token spans: the exact-substring dedup
    * signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), approximated with fixed-width (k=8) token
    * windows instead of suffix arrays. Every sliding 8-token window is
    * hashed; a window whose hash occurs in >= 2 DISTINCT documents is a
    * shared span, and each document reports how many of its token
    * positions are covered by shared spans (interval union computed as
    * count-distinct of exploded positions) — `dup_frac` is the fraction
    * a span-level dedup pass would cut.
    *
    * Shape at scale: the span table is O(total tokens) rows keyed by a
    * 128-bit hash, so the duplicate-detection groupBy shuffles compact
    * fixed-width keys, never the span text; the semi-join back and the
    * k-way position explode run only on spans that ARE shared (rare in a
    * clean corpus), keeping the second shuffle proportional to the
    * duplication actually present. Suffix-array construction would find
    * variable-length repeats but is sequential; fixed-k windows
    * under-merge adjacent repeats yet parallelize embarrassingly. */
  val d16RepeatedSpans = q("d16_repeated_spans",
    s"""WITH tok AS (
       |$tokCte),
       |span AS (
       |  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+7], ' ')) AS h
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
       |        FROM tok WHERE len(t) >= 8)),
       |shared AS (
       |  SELECT h FROM span GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |sspan AS (
       |  SELECT s.doc_id, s.pos FROM span s JOIN shared USING (h)),
       |scnt AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_spans
       |  FROM sspan GROUP BY 1),
       |cov AS (
       |  SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS covered_tokens
       |  FROM (SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS p
       |        FROM sspan)
       |  GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       |       coalesce(n.n_shared_spans, 0) AS n_shared_spans,
       |       coalesce(c.covered_tokens, 0) AS covered_tokens,
       |       ${rnd("coalesce(c.covered_tokens, 0) * 1.0 / len(t.t)", 4)} AS dup_frac
       |FROM tok t LEFT JOIN scnt n USING (doc_id) LEFT JOIN cov c USING (doc_id)""".stripMargin) { (s, d) =>
    val k = 8
    val base = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val spans = base
      .where(size(col("t")) >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("t")) - (k - 1)),
          i => md5(array_join(slice(col("t"), i, lit(k)), " "))))
        .as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
    val shared = spans.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2)
      .select("h")
    val cov = spans.join(shared, Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_spans"),
        size(array_distinct(flatten(collect_list(
          sequence(col("pos"), col("pos") + (k - 1)))))).cast("long")
          .as("covered_tokens"))
    base.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)) * lit(1.0) / col("n_tokens"), 4)
          .as("dup_frac"))
  }

  /** T22 — PMI collocation mining: pointwise mutual information of
    * adjacent token pairs, ln(p(a,b) / (p(a)·p(b))) with bigram and
    * unigram MLE probabilities, over pairs seen >= 5 times. The standard
    * collocation / multi-word-expression detector (Church & Hanks 1990)
    * a tokenizer-vocabulary build wants next to raw counts (t10) and
    * skip-grams (t16).
    *
    * Shape at scale: two shuffles that both partial-aggregate map-side
    * (unigram counts, bigram counts); the two corpus totals collapse to
    * one row each and broadcast into the final projection, and the
    * unigram join keys are vocabulary-sized — Spark broadcasts them
    * against the (already >= 5-filtered) bigram table. The PMI argument
    * is computed with one fixed multiplication order on exact integer
    * counts, so the double is bit-identical on any engine. */
  val t22PmiCollocations = q("t22_pmi_collocations",
    s"""WITH tok AS (
       |$tokCte),
       |uni AS (SELECT unnest(t) AS w FROM tok),
       |ucnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
       |big AS (SELECT t[i] AS w1, t[i+1] AS w2
       |        FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
       |              FROM tok WHERE len(t) >= 2)),
       |bcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
       |         FROM big GROUP BY 1, 2),
       |btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM big)
       |SELECT w1, w2, n_pair, u1.c AS n_w1, u2.c AS n_w2,
       |       ${rnd("ln((CAST(n_pair AS DOUBLE) * n * n) / (CAST(b AS DOUBLE) * u1.c * u2.c))", 6)} AS pmi
       |FROM bcnt JOIN ucnt u1 ON w1 = u1.w JOIN ucnt u2 ON w2 = u2.w, tot, btot
       |WHERE n_pair >= 5""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
    val ucnt = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(count(lit(1)).as("n"))
    val big = toks.where(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val bcnt = big.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= 5)
    val btot = big.agg(count(lit(1)).as("b"))
    bcnt
      .join(broadcast(ucnt.select(col("w").as("w1"), col("c").as("n_w1"))), Seq("w1"))
      .join(broadcast(ucnt.select(col("w").as("w2"), col("c").as("n_w2"))), Seq("w2"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(btot))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        round(log((col("n_pair").cast("double") * col("n") * col("n")) /
          (col("b").cast("double") * col("n_w1") * col("n_w2"))), 6).as("pmi"))
  }

  /** G8 — per-group weekly volume trend: OLS slope and intercept of
    * weekly order counts against the epoch-week index, one regression
    * per order priority. The closed-form normal equations run entirely
    * on EXACT integer sums (weeks and counts are integers; sums of
    * products stay in long range), so the only floating-point operations
    * are the two final divisions — bit-identical on any engine and any
    * partitioning, which is precisely what `regr_slope` over doubles
    * cannot promise.
    *
    * Shape at scale: first shuffle keyed (priority, week) partial-
    * aggregates map-side to one row per group-week; the second is 5 rows.
    * Nothing here is proportional to fact-table size after the first
    * map-side combine. */
  val g8TrendSlope = q("g8_trend_slope",
    s"""WITH wk AS (
       |  SELECT o_orderpriority AS priority,
       |         CAST(floor(date_diff('day', DATE '1970-01-01',
       |                              CAST(o_orderdate AS DATE)) / 7.0) AS BIGINT) AS week,
       |         CAST(count(*) AS BIGINT) AS y
       |  FROM orders GROUP BY 1, 2),
       |s AS (
       |  SELECT priority, CAST(count(*) AS BIGINT) AS n,
       |         sum(week) AS sx, sum(y) AS sy,
       |         sum(week * y) AS sxy, sum(week * week) AS sxx
       |  FROM wk GROUP BY 1)
       |SELECT priority, n AS n_weeks,
       |       ${rnd("CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)", 6)} AS slope,
       |       ${rnd("(CAST(sy AS DOUBLE) * (n * sxx - sx * sx) - CAST(n * sxy - sx * sy AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n * sxx - sx * sx))", 6)} AS intercept
       |FROM s""".stripMargin) { (s, d) =>
    val wk = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"),
        floor(datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")) / 7.0)
          .cast("long").as("week"))
      .agg(count(lit(1)).as("y"))
    wk.groupBy("priority")
      .agg(count(lit(1)).as("n"), sum("week").as("sx"), sum("y").as("sy"),
        sum(col("week") * col("y")).as("sxy"),
        sum(col("week") * col("week")).as("sxx"))
      .select(col("priority"), col("n").as("n_weeks"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy").cast("double") * (col("n") * col("sxx") - col("sx") * col("sx")) -
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") * col("sx")) /
          (col("n").cast("double") * (col("n") * col("sxx") - col("sx") * col("sx"))), 6)
          .as("intercept"))
  }

  /** E31 — exponentially-weighted moving average per key (α = 0.2): the
    * standard smoothing/decay feature for event streams, computed as an
    * explicit LEFT FOLD over the (ts, event_id)-ordered value list. EWMA
    * is order-sensitive by definition, so a distributed engine can only
    * make it deterministic by fixing a total order and folding
    * sequentially within the key — collect-sort-fold per key, with both
    * engines running the identical fold expression, makes the doubles
    * bit-identical.
    *
    * Shape at scale: one shuffle (groupBy user); per-key state is the
    * key's own history, the same memory bound a streaming
    * mapGroupsWithState EWMA would carry. Keys are independent — skew in
    * events-per-user is the only hazard, and a heavy key caps at its list
    * length, not the corpus. */
  val e31Ewma = q("e31_ewma",
    s"""WITH lst AS (
       |  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
       |  FROM events GROUP BY 1)
       |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
       |       ${rnd("list_reduce(vs, (acc, x) -> 0.8 * acc + 0.2 * x)", 6)} AS ewma
       |FROM lst""".stripMargin) { (s, d) =>
    val vs = transform(
      array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
      e => e.getField("value"))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(vs.as("vs"))
      .select(col("user_id"), size(col("vs")).cast("long").as("n_events"),
        round(aggregate(slice(col("vs"), lit(2), greatest(size(col("vs")) - 1, lit(0))),
          element_at(col("vs"), 1),
          (acc, x) => lit(0.8) * acc + lit(0.2) * x), 6).as("ewma"))
  }

  /** M4 — ViT-style patch extraction (the image half of the multimodal
    * path): each document's leading 128 characters stand in for an 8×16
    * row-major image; extract the 2×4 grid of non-overlapping 4×4
    * patches, each patch assembled from its four row-slices with explicit
    * offset arithmetic (`patch_off` = byte offset of the patch origin)
    * and fingerprinted. The decode step is the deterministic stand-in the
    * container's codec-free environment requires — the Spark-side
    * plumbing (2-D index arithmetic, per-patch slicing, hash) is the real
    * ViT/CLIP preprocessing layout.
    *
    * Shape at scale: pure scan-side row expansion (8 rows out per doc, no
    * shuffle at all); the patch grid is GENERATED, never filtered, so no
    * wasted slicing on dropped regions. */
  val m4Patchify = q("m4_patchify",
    """WITH img AS (SELECT doc_id, text FROM documents WHERE length(text) >= 128),
      |grid AS (SELECT doc_id, text, pr.r AS pr, pc.c AS pc
      |         FROM img CROSS JOIN range(0, 2) pr(r) CROSS JOIN range(0, 4) pc(c))
      |SELECT doc_id, CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
      |       CAST(pr * 64 + pc * 4 AS INT) AS patch_off,
      |       md5(substr(text, CAST(pr*64 + 0*16 + pc*4 + 1 AS INT), 4) ||
      |           substr(text, CAST(pr*64 + 1*16 + pc*4 + 1 AS INT), 4) ||
      |           substr(text, CAST(pr*64 + 2*16 + pc*4 + 1 AS INT), 4) ||
      |           substr(text, CAST(pr*64 + 3*16 + pc*4 + 1 AS INT), 4)) AS patch_md5
      |FROM grid""".stripMargin) { (s, d) =>
    val rows = 4
    val rowW = 16
    val patch = 4
    Tables.documents(s, d)
      .where(length(col("text")) >= 128)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(1))).as("pr"))
      .select(col("doc_id"), col("text"), col("pr"),
        explode(sequence(lit(0), lit(3))).as("pc"))
      .select(col("doc_id"),
        col("pr").cast("int").as("patch_row"),
        col("pc").cast("int").as("patch_col"),
        (col("pr") * 64 + col("pc") * patch).cast("int").as("patch_off"),
        md5(concat((0 until rows).map(r =>
          col("text").substr(col("pr") * 64 + r * rowW + col("pc") * patch + 1,
            lit(patch))): _*)).as("patch_md5"))
  }

  val all: Seq[Q] = Seq(d16RepeatedSpans, t22PmiCollocations, g8TrendSlope,
    e31Ewma, m4Patchify)
}
