package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{NearDup, TextAnalysis}

/** Training-data text operators over `documents`: dedup family
  * (exact / MinHash+LSH / SimHash / n-gram Jaccard), language ID, quality
  * scoring, token counting, fingerprinting. All hash primitives are
  * md5-based so the DuckDB oracle reproduces signatures bit-for-bit.
  */
object TextQueries {

  /** Shared DuckDB token/shingle CTE prelude. */
  private val tokCte =
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |              ELSE list_transform(generate_series(1, len(t) - 2),
      |                                  i -> array_to_string(t[i:i+2], ' ')) END AS shingles
      |  FROM tok)""".stripMargin

  /** D1 — exact dedup: hash-groupBy on normalized content, keep min id
    * (the 100 TB path: one shuffle on a 128-bit key). */
  val d1Exact = q("d1_exact_dedup",
    """SELECT md5(array_to_string(list_filter(string_split_regex(trim(text), '\s+'),
      |                                       x -> x <> ''), ' ')) AS content_hash,
      |       CAST(count(*) AS BIGINT) AS n_copies,
      |       min(doc_id) AS keep_id
      |FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(TextAnalysis.normalizedHash(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
  }

  /** D2 — MinHash signatures (k=8 over 3-token shingles): min of md5 per
    * seed; signatures computed scan-side, zero shuffle. */
  val d2Minhash = q("d2_minhash_signature",
    tokCte + "\n" +
    (0 until 8).map(i =>
      s"list_min(list_transform(shingles, s -> md5('$i:' || s))) AS sig$i")
      .mkString("SELECT doc_id,\n", ",\n", "\nFROM sh")) { (s, d) =>
    NearDup.withMinhashSignature(
      Tables.documents(s, d), "doc_id", col("text"), n = 3, k = 8)
  }

  /** D3 — LSH candidate pairs: band = one signature row (8 bands × 1 row),
    * pairs agreeing on ≥1 band with collision count. The banding groupBy
    * replaces the O(n²) cross join — the at-scale design. */
  val d3LshPairs = q("d3_lsh_candidate_pairs",
    tokCte + """,
      |sigs AS (
      |  SELECT doc_id, u.band,
      |         md5(list_min(list_transform(shingles, s -> md5(u.band || ':' || s)))) AS h
      |  FROM sh CROSS JOIN range(0, 8) u(band))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_bands
      |FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
      |WHERE a.doc_id < b.doc_id
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    NearDup.lshCandidates(Tables.documents(s, d), "doc_id", col("text"),
      n = 3, k = 8, bands = 8)
  }

  /** D4 — 16-bit SimHash over the token multiset (hex-digit-MSB votes). */
  val d4Simhash = q("d4_simhash",
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
      |  FROM tok GROUP BY doc_id)
      |SELECT doc_id, CAST(""".stripMargin +
    (0 until 16).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ") +
    " AS BIGINT) AS simhash\nFROM bits") { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tk"))
    NearDup.simhash16(toks, "doc_id", "tk")
  }

  /** D5 — exact n-gram Jaccard verification on the LSH candidates:
    * |A∩B| / |A∪B| over distinct 3-shingles. At 100 TB only the candidate
    * fraction pays the join. */
  val d5Jaccard = q("d5_ngram_jaccard",
    tokCte + s""",
      |sigs AS (
      |  SELECT doc_id, u.band,
      |         md5(list_min(list_transform(shingles, s -> md5(u.band || ':' || s)))) AS h
      |  FROM sh CROSS JOIN range(0, 8) u(band)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
      |  WHERE a.doc_id < b.doc_id),
      |sets AS (SELECT doc_id, list_distinct(shingles) AS shset FROM sh)
      |SELECT c.id_a, c.id_b,
      |       ${rnd("CAST(len(list_distinct(list_intersect(a.shset, b.shset))) AS DOUBLE) / (len(a.shset) + len(b.shset) - len(list_distinct(list_intersect(a.shset, b.shset))))", 4)} AS jaccard
      |FROM cand c
      |JOIN sets a ON c.id_a = a.doc_id
      |JOIN sets b ON c.id_b = b.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val cands = NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
    NearDup.jaccardOnPairs(docs, cands, "doc_id", col("text"), 3)
  }

  // language marker vocabularies (disjoint subsets of the corpus vocab)
  val markers: Map[String, Seq[String]] = Map(
    "sqlish" -> Seq("query", "join", "table", "agg", "group"),
    "streamish" -> Seq("stream", "batch", "window", "event"),
    "storish" -> Seq("row", "column", "scan", "hash", "sort"),
    "sizish" -> Seq("big", "small", "fast", "slow"))

  private def markerSql(ws: Seq[String]) = ws.map("'" + _ + "'").mkString("(", ",", ")")

  /** Marker vocabulary as a SQL IN-list (shared with t13's oracle). */
  private[queries] def markerSqlFor(lang: String): String = markerSql(markers(lang))

  /** T1 — language ID: marker-vocabulary hit counts, argmax with a fixed
    * priority tiebreak (n-gram-profile method at unigram granularity). */
  val t1LangId = q("t1_langid",
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
       |                             x -> x <> '') AS t
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id,
       |         len(list_filter(t, x -> x IN ${markerSql(markers("sizish"))})) AS s_sizish,
       |         len(list_filter(t, x -> x IN ${markerSql(markers("sqlish"))})) AS s_sqlish,
       |         len(list_filter(t, x -> x IN ${markerSql(markers("storish"))})) AS s_storish,
       |         len(list_filter(t, x -> x IN ${markerSql(markers("streamish"))})) AS s_streamish
       |  FROM tok)
       |SELECT doc_id,
       |       CASE WHEN s_sizish > 0 AND s_sizish >= s_sqlish AND s_sizish >= s_storish
       |                 AND s_sizish >= s_streamish THEN 'sizish'
       |            WHEN s_sqlish > 0 AND s_sqlish >= s_storish
       |                 AND s_sqlish >= s_streamish THEN 'sqlish'
       |            WHEN s_storish > 0 AND s_storish >= s_streamish THEN 'storish'
       |            WHEN s_streamish > 0 THEN 'streamish'
       |            ELSE 'und' END AS pred_lang
       |FROM scored""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.langId(col("text"), markers).as("pred_lang"))
  }

  /** T2 — quality scoring: length/richness/stopword-rate composite. */
  private[queries] val distRatioSql =
    "CASE WHEN len(t) = 0 THEN 0.0 ELSE CAST(len(list_distinct(t)) AS DOUBLE) / len(t) END"
  private[queries] val stopRatioSql =
    "CASE WHEN len(t) = 0 THEN 0.0 ELSE CAST(len(list_filter(t, x -> x IN ('a','the'))) AS DOUBLE) / len(t) END"
  val t2Quality = q("t2_quality_score",
    s"""WITH tok AS (
      |  SELECT doc_id, n_chars,
      |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(len(t) AS INT) AS n_tokens,
      |       ${rnd(distRatioSql, 4)} AS distinct_ratio,
      |       ${rnd(stopRatioSql, 4)} AS stopword_ratio,
      |       ${rnd(s"least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4 + ($distRatioSql) * 0.4 + (1.0 - abs(($stopRatioSql) - 0.1)) * 0.2", 4)} AS quality
      |FROM tok""".stripMargin) { (s, d) =>
    val stop = Seq("a", "the")
    Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      round(TextAnalysis.distinctRatio(col("text")), 4).as("distinct_ratio"),
      round(TextAnalysis.stopwordRatio(col("text"), stop), 4).as("stopword_ratio"),
      TextAnalysis.qualityScore(col("text"), col("n_chars"), stop).as("quality"))
  }

  /** T3 — token counting: whitespace + BPE-ish regex tokens + byte check. */
  val t3TokenCount = q("t3_token_count",
    """SELECT doc_id,
      |       CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |                            x -> x <> '')) AS INT) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INT) AS regex_tokens,
      |       CAST(length(text) AS BIGINT) AS n_chars_actual
      |FROM documents""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
      TextAnalysis.regexTokenCount(col("text")).as("regex_tokens"),
      length(col("text")).cast("bigint").as("n_chars_actual"))
  }

  /** T4 — fingerprints: order-insensitive bag hash + normalized hash. */
  val t4Fingerprint = q("t4_fingerprint",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
      |                             x -> x <> '') AS t
      |  FROM documents)
      |SELECT doc_id,
      |       md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS bag_fingerprint,
      |       md5(array_to_string(t, ' ')) AS content_hash
      |FROM tok""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("bag_fingerprint"),
      TextAnalysis.normalizedHash(col("text")).as("content_hash"))
  }

  /** T5 — deterministic hash-based sampling / train-test split: the
    * reproducible-at-100 TB pattern (content-hash thresholding — stable
    * across runs, engines, and cluster layouts, unlike RNG sampling).
    * ~1/8 of docs land in 'test' (first md5 hex digit 0 or 1), ~25% in
    * the sampled flag (first digit < '4'). */
  val t5HashSample = q("t5_hash_sample",
    """SELECT doc_id,
      |       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
      |            THEN 'test' ELSE 'train' END AS split,
      |       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4' AS in_sample
      |FROM documents""".stripMargin) { (s, d) =>
    val h1 = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(s, d).select(col("doc_id"),
      when(h1.isin("0", "1"), lit("test")).otherwise(lit("train")).as("split"),
      (h1 < "4").as("in_sample"))
  }

  /** C1 — the composed curation pipeline (training-data flagship):
    * quality gate → exact dedup (keep min id per content hash) →
    * near-dup removal (LSH candidates among survivors, exact Jaccard ≥
    * 0.5, drop the higher id) → deterministic hash split. Every stage is
    * the already-verified operator; this query proves they COMPOSE with
    * oracle-exact semantics end-to-end. */
  val c1Curation = q("c1_curation_pipeline",
    s"""WITH tok AS (
       |  SELECT doc_id, n_chars,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |              ELSE list_transform(generate_series(1, len(t) - 2),
       |                                  i -> array_to_string(t[i:i+2], ' ')) END AS shingles
       |  FROM tok),
       |quality AS (
       |  SELECT doc_id,
       |         ${rnd(s"least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4 + ($distRatioSql) * 0.4 + (1.0 - abs(($stopRatioSql) - 0.1)) * 0.2", 4)} AS quality,
       |         md5(array_to_string(t, ' ')) AS content_hash
       |  FROM tok),
       |kept1 AS (SELECT * FROM quality WHERE quality >= 0.55),
       |kept2 AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (PARTITION BY content_hash
       |                                      ORDER BY doc_id ASC) AS rn
       |    FROM kept1) WHERE rn = 1),
       |sigs AS (
       |  SELECT doc_id, u.band,
       |         md5(list_min(list_transform(shingles, s -> md5(u.band || ':' || s)))) AS h
       |  FROM sh CROSS JOIN range(0, 8) u(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
       |  WHERE a.doc_id < b.doc_id
       |    AND a.doc_id IN (SELECT doc_id FROM kept2)
       |    AND b.doc_id IN (SELECT doc_id FROM kept2)),
       |sets AS (SELECT doc_id, list_distinct(shingles) AS shset FROM sh),
       |removed AS (
       |  SELECT DISTINCT c.id_b AS doc_id
       |  FROM cand c JOIN sets a ON c.id_a = a.doc_id JOIN sets b ON c.id_b = b.doc_id
       |  WHERE ${rnd("CAST(len(list_distinct(list_intersect(a.shset, b.shset))) AS DOUBLE) / (len(a.shset) + len(b.shset) - len(list_distinct(list_intersect(a.shset, b.shset))))", 4)} >= 0.5)
       |SELECT k.doc_id,
       |       CASE WHEN substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 1) IN ('0','1')
       |            THEN 'test' ELSE 'train' END AS split
       |FROM kept2 k WHERE k.doc_id NOT IN (SELECT doc_id FROM removed)""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val stop = Seq("a", "the")
    val quality = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text"), col("n_chars"), stop).as("quality"),
      TextAnalysis.normalizedHash(col("text")).as("content_hash"))
    val kept1 = quality.where(col("quality") >= 0.55)
    // kept2 feeds THREE consumers (two semi joins + the final anti join);
    // materialize once — at scale this is the persisted stage boundary
    // between the dedup and near-dup phases of the pipeline
    val kept2 = graft.ops.Dedup.keepFirstBy(kept1, Seq("content_hash"),
      Seq(col("doc_id").asc)).select("doc_id").localCheckpoint(true)
    // near-dup candidates over SURVIVORS only: signatures are per-doc, so
    // pairs-among-kept2 ≡ pairs-over-all ∩ kept2² — and the minhash
    // pipeline (the expensive pass) runs on the post-quality-gate corpus,
    // which at production selectivities is a fraction of the input
    val cands = NearDup.lshCandidates(docs.join(kept2, Seq("doc_id"), "left_semi"),
      "doc_id", col("text"), 3, 8, 8)
    val removed = NearDup.jaccardOnPairs(docs, cands, "doc_id", col("text"), 3)
      .where(col("jaccard") >= 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    kept2.join(removed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"),
          lit("test")).otherwise(lit("train")).as("split"))
  }

  /** D6 — transitive dup clustering: connected components over the LSH
    * candidate graph, cluster id = min doc id in the component. Oracle is
    * an independent algorithm: a recursive-CTE reachability closure —
    * both must land on the same unique fixpoint. */
  val d6DupClusters = q("d6_dup_clusters",
    (tokCte + """,
      |sigs AS (
      |  SELECT doc_id, u.band,
      |         md5(list_min(list_transform(shingles, s -> md5(u.band || ':' || s)))) AS h
      |  FROM sh CROSS JOIN range(0, 8) u(band)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
      |  WHERE a.doc_id < b.doc_id),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT doc_id, doc_id AS label FROM documents
      |  UNION
      |  SELECT e.dst AS doc_id, r.label
      |  FROM reach r JOIN edges e ON e.src = r.doc_id)
      |SELECT doc_id, min(label) AS cluster_id
      |FROM reach GROUP BY doc_id""".stripMargin)
      .replaceFirst("WITH ", "WITH RECURSIVE ")) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
    graft.text.DupClusters.connectedComponents(
      docs.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
  }

  val all: Seq[Q] = Seq(d1Exact, d2Minhash, d3LshPairs, d4Simhash, d5Jaccard,
    d6DupClusters, t1LangId, t2Quality, t3TokenCount, t4Fingerprint,
    t5HashSample, c1Curation)
}
