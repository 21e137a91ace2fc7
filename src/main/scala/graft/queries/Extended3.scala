package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.NearDup

/** Round-2 widening, part 3: time-RANGE window frames, MinHash-estimate
  * vs exact Jaccard, the curation-funnel observability report, and bigram
  * language-model scoring.
  */
object Extended3 {

  /** W8 — trailing time-RANGE window frame (10-minute lookback per user):
    * the frame is defined by the ORDER BY VALUE, not row position, so
    * peers (equal timestamps) enter together — deterministic under any
    * tie order, unlike ROWS frames. One shuffle on user_id; state at
    * scale is bounded by events-per-user-per-10min. */
  val w8RangeWindow = q("w8_trailing_range_window",
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) // 1000000 AS tsec, value
       |  FROM events)
       |SELECT event_id, user_id,
       |       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       |       ${rnd("sum(value) OVER w", 4)} AS sum_trailing
       |FROM e
       |WINDOW w AS (PARTITION BY user_id ORDER BY tsec
       |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("tsec"))
      .rangeBetween(-600, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) / 1000000L).cast("long").as("tsec"), col("value"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing"),
        round(sum("value").over(w), 4).as("sum_trailing"))
  }

  /** D7 — MinHash similarity ESTIMATE vs candidate pairs: fraction of the
    * k=8 signature components that agree — the estimator whose expectation
    * IS the Jaccard similarity (Broder '97). The signature table is
    * materialized once and feeds both the banding and the comparison; at
    * 100 TB this replaces d5's exact verification wherever ±1/k error is
    * acceptable, avoiding the shingle-set join entirely. */
  val d7MinhashEstimate = q("d7_minhash_estimate",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |              ELSE list_transform(generate_series(1, len(t) - 2),
      |                                  i -> array_to_string(t[i:i+2], ' ')) END AS shingles
      |  FROM tok),
      |sw AS (
      |  SELECT doc_id,
      |""".stripMargin +
    (0 until 8).map(i =>
      s"         list_min(list_transform(shingles, s -> md5('$i:' || s))) AS sig$i")
      .mkString(",\n") +
    """
      |  FROM sh),
      |sigs AS (
      |  SELECT doc_id, u.band,
      |         md5(CASE u.band """.stripMargin +
    (0 until 8).map(i => s"WHEN $i THEN sig$i").mkString(" ") +
    """ END) AS h
      |  FROM sw CROSS JOIN range(0, 8) u(band)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
      |  WHERE a.doc_id < b.doc_id)
      |SELECT p.id_a, p.id_b,
      |       CAST(""".stripMargin +
    (0 until 8).map(i => s"(a.sig$i = b.sig$i)::INT").mkString(" + ") +
    """ AS INT) AS n_sig_match,
      |       CAST((""".stripMargin +
    (0 until 8).map(i => s"(a.sig$i = b.sig$i)::INT").mkString(" + ") +
    """) / 8.0 AS DOUBLE) AS est_jaccard
      |FROM pairs p
      |JOIN sw a ON p.id_a = a.doc_id
      |JOIN sw b ON p.id_b = b.doc_id""".stripMargin) { (s, d) =>
    val sigs = NearDup.withMinhashSignature(
      Tables.documents(s, d), "doc_id", col("text"), n = 3, k = 8)
      .localCheckpoint(true)
    val pairs = NearDup.lshCandidatesFromSigs(sigs, "doc_id", k = 8, bands = 8)
      .select("id_a", "id_b")
    val matches = (0 until 8)
      .map(i => when(col(s"a_sig$i") === col(s"b_sig$i"), 1).otherwise(0))
      .reduce(_ + _)
    val a = sigs.select(col("doc_id").as("id_a") +:
      (0 until 8).map(i => col(s"sig$i").as(s"a_sig$i")): _*)
    val b = sigs.select(col("doc_id").as("id_b") +:
      (0 until 8).map(i => col(s"sig$i").as(s"b_sig$i")): _*)
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        matches.cast("int").as("n_sig_match"),
        (matches / 8.0).as("est_jaccard"))
  }

  /** T11 — curation-funnel observability report: survivor counts after
    * each gate of the c1 pipeline's cheap prefix (quality gate → exact
    * dedup → split assignment). Every production corpus pipeline ships
    * this per-stage retention table; each count is a partial-aggregable
    * scan, no stage adds a shuffle beyond its own dedup. */
  val t11CurationFunnel = q("t11_curation_funnel",
    s"""WITH tok AS (
       |  SELECT doc_id, n_chars,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id,
       |         ${rnd(s"least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4 + (${TextQueries.distRatioSql}) * 0.4 + (1.0 - abs((${TextQueries.stopRatioSql}) - 0.1)) * 0.2", 4)} AS quality,
       |         md5(array_to_string(t, ' ')) AS content_hash
       |  FROM tok),
       |kept1 AS (SELECT * FROM quality WHERE quality >= 0.55),
       |kept2 AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (PARTITION BY content_hash
       |                                      ORDER BY doc_id ASC) AS rn
       |    FROM kept1) WHERE rn = 1)
       |SELECT '1_total' AS stage, CAST(count(*) AS BIGINT) AS n FROM documents
       |UNION ALL SELECT '2_quality', CAST(count(*) AS BIGINT) FROM kept1
       |UNION ALL SELECT '3_exact_dedup', CAST(count(*) AS BIGINT) FROM kept2
       |UNION ALL
       |SELECT '4_train', CAST(count(*) AS BIGINT) FROM kept2
       |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) NOT IN ('0','1')""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val stop = Seq("a", "the")
    val quality = docs.select(col("doc_id"),
      graft.text.TextAnalysis.qualityScore(col("text"), col("n_chars"), stop)
        .as("quality"),
      graft.text.TextAnalysis.normalizedHash(col("text")).as("content_hash"))
    val kept1 = quality.where(col("quality") >= 0.55)
    val kept2 = graft.ops.Dedup.keepFirstBy(kept1, Seq("content_hash"),
      Seq(col("doc_id").asc)).select("doc_id").localCheckpoint(true)
    val train = kept2.where(
      !substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
    def cnt(df: org.apache.spark.sql.DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n")).select(lit(stage).as("stage"), col("n"))
    cnt(docs, "1_total").union(cnt(kept1, "2_quality"))
      .union(cnt(kept2, "3_exact_dedup")).union(cnt(train, "4_train"))
  }

  /** T12 — bigram language-model scoring: per-document mean log MLE
    * bigram probability against the corpus's own bigram statistics — the
    * perplexity-style quality signal of corpus curation. The bigram
    * count table builds with one map-side-combined shuffle; the unigram
    * table derives from it (vocab-sized agg, NOT a second pass over the
    * corpus — ln splits, so n1 = Σ n2 per w1); scoring shuffle-joins the
    * re-exploded bigrams to both count tables on their natural keys and
    * pays one per-doc shuffle. NO broadcast hints: the bigram vocabulary
    * GROWS WITH THE CORPUS, so broadcasting it is a driver-OOM at scale
    * (r3 driver bench measured 14 s at local[32] with the hint vs <2 s
    * without); the (w1,w2) shuffle of bg is shared between the c2
    * aggregation and the join via ReusedExchange, and AQE still picks a
    * broadcast join at runtime when the counts happen to be small. (An
    * array-local variant with broadcast MAP columns benchmarked SLOWER —
    * Catalyst MapData lookups are linear scans.) */
  val t12BigramLm = q("t12_bigram_lm_score",
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       |  FROM tok CROSS JOIN LATERAL unnest(generate_series(1, len(t) - 1)) u(i)
       |  WHERE len(t) >= 2),
       |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1)
       |SELECT b.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_bigrams,
       |       ${rnd("avg(ln(CAST(c2.n2 AS DOUBLE) / c1.n1))", 4)} AS mean_log_prob
       |FROM bg b
       |JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
       |JOIN c1 ON b.w1 = c1.w1
       |GROUP BY b.doc_id""".stripMargin) { (s, d) =>
    val toks = graft.text.TextAnalysis.tokens(col("text"))
    def bg = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = c2.groupBy("w1").agg(sum("n2").as("n1"))
    bg.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("n2").cast("double") / col("n1"))), 4)
          .as("mean_log_prob"))
  }

  val all: Seq[Q] = Seq(w8RangeWindow, d7MinhashEstimate, t11CurationFunnel,
    t12BigramLm)
}
