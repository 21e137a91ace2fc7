package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextAnalysis

/** Round-2 widening, part 29: corpus-accounting and calibration
  * reports — the per-source effective-token budget, per-document n-gram
  * novelty, a dedup-method agreement matrix, and the covisitation
  * graph's degree distribution.
  */
object Extended29 {

  /** T31 — effective-token budget per source: raw docs/tokens vs what
    * survives exact dedup (keep min doc_id per normalized content hash)
    * — the number a pretraining data plan is actually built on ("we have
    * 4.1B tokens of sourceX after dedup, not 5.6B"). Composes d1's
    * keeper rule with t3's token counts; one aggregation per grain, all
    * partial-aggregable. */
  val t31TokenBudget = q("t31_token_budget",
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |         md5(array_to_string(list_filter(string_split_regex(trim(text), '\\s+'),
       |                                         x -> x <> ''), ' ')) AS h,
       |         len(list_filter(string_split_regex(trim(text), '\\s+'),
       |                         x -> x <> '')) AS n_tok
       |  FROM documents),
       |keep AS (SELECT h, min(doc_id) AS keep_id FROM tok GROUP BY 1)
       |SELECT t.source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(t.n_tok) AS BIGINT) AS raw_tokens,
       |       CAST(count(CASE WHEN t.doc_id = k.keep_id THEN 1 END) AS BIGINT) AS kept_docs,
       |       CAST(sum(CASE WHEN t.doc_id = k.keep_id THEN t.n_tok ELSE 0 END) AS BIGINT) AS effective_tokens,
       |       ${rnd("1.0 - CAST(sum(CASE WHEN t.doc_id = k.keep_id THEN t.n_tok ELSE 0 END) AS DOUBLE) / sum(t.n_tok)", 4)} AS dedup_savings
       |FROM tok t JOIN keep k ON t.h = k.h
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        TextAnalysis.normalizedHash(col("text")).as("h"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    val keep = tok.groupBy("h").agg(min("doc_id").as("keep_id"))
    tok.join(keep, Seq("h"))
      .withColumn("kept", col("doc_id") === col("keep_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("raw_tokens"),
        count(when(col("kept"), 1)).as("kept_docs"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("effective_tokens"),
        round(lit(1.0) - sum(when(col("kept"), col("n_tok")).otherwise(0L))
          .cast("double") / sum("n_tok"), 4).as("dedup_savings"))
  }

  /** T32 — n-gram novelty: the share of a document's DISTINCT 3-shingles
    * whose global first appearance (min doc_id — the corpus's ingest
    * order) is this document. Low novelty = the doc is recombined from
    * already-seen text even when no single document matches it (what
    * pairwise dedup can't see). Same plan shape as the inverted index:
    * one shuffle keyed by shingle to find first owners, one per-doc
    * rollup. */
  val t32NgramNovelty = q("t32_ngram_novelty",
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(
       |           CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |                ELSE list_transform(generate_series(1, len(t) - 2),
       |                                    i -> array_to_string(t[i:i+2], ' ')) END)) AS g
       |  FROM tok),
       |first_seen AS (SELECT g, min(doc_id) AS first_id FROM sh GROUP BY 1)
       |SELECT s.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_shingles,
       |       CAST(count(CASE WHEN f.first_id = s.doc_id THEN 1 END) AS BIGINT) AS n_novel,
       |       ${rnd("CAST(count(CASE WHEN f.first_id = s.doc_id THEN 1 END) AS DOUBLE) / count(*)", 4)} AS novelty
       |FROM sh s JOIN first_seen f ON s.g = f.g
       |GROUP BY 1""".stripMargin) { (s, d) =>
    // first-owner via a whole-partition window min on the shingle key:
    // ONE shuffle of the exploded set (the groupBy+join-back form pays
    // that shuffle twice and recomputes the md5-heavy explode for each
    // side — measured 3× slower at sf0.1). The repartition before the
    // explode exists because the input is ONE unsplittable row group
    // (guide §2.5 input skew): without it the tokenize+shingle work runs
    // on a single task; scale-adaptive via defaultParallelism.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(graft.text.NearDup.shingles(col("text"), 3))).as("g"))
      .withColumn("first_id", min("doc_id").over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_id") === col("doc_id"), 1)).as("n_novel"),
        round(count(when(col("first_id") === col("doc_id"), 1)).cast("double")
          / count(lit(1)), 4).as("novelty"))
  }

  /** D20 — dedup-method agreement matrix: every LSH candidate pair gets
    * three independent verdicts — exact (normalized content hash equal),
    * MinHash-verified (3-shingle Jaccard ≥ 0.5), SimHash (16-bit Hamming
    * ≤ 3) — and the matrix counts pairs per verdict combination. This is
    * how thresholds get calibrated before a 100 TB run: the
    * (exact=false, jaccard=true, simhash=false) cell is exactly the
    * recall SimHash's bit width is giving up. Verdict computation is
    * per-pair on the bounded candidate set; corpus-side work is the
    * shared signature scan. */
  val d20MethodAgreement = q("d20_method_agreement", {
    val toks = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
    s"""WITH tok AS (
       |  SELECT doc_id, $toks AS t FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |              ELSE list_transform(generate_series(1, len(t) - 2),
       |                                  i -> array_to_string(t[i:i+2], ' ')) END AS shingles
       |  FROM tok),
       |sigs AS (
       |  SELECT doc_id, u.band,
       |         md5(list_min(list_transform(shingles, s -> md5(u.band || ':' || s)))) AS h
       |  FROM sh CROSS JOIN range(0, 8) u(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
       |  WHERE a.doc_id < b.doc_id),
       |chash AS (SELECT doc_id, md5(array_to_string(t, ' ')) AS ch FROM tok),
       |bits AS (
       |  SELECT doc_id,
       |""".stripMargin +
    (0 until 16).map(b =>
      s"         sum(CASE WHEN substr(md5(tk), ${b + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n") +
    """
      |  FROM (SELECT doc_id, unnest(t) AS tk FROM tok) GROUP BY doc_id),
      |simh AS (
      |  SELECT doc_id, CAST(""".stripMargin +
    (0 until 16).map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ") +
    s""" AS BIGINT) AS sh FROM bits),
       |sets AS (SELECT doc_id, list_distinct(shingles) AS shset FROM sh),
       |verdicts AS (
       |  SELECT c.id_a, c.id_b,
       |         ha.ch = hb.ch AS exact_dup,
       |         ${rnd("CAST(len(list_distinct(list_intersect(a.shset, b.shset))) AS DOUBLE) / (len(a.shset) + len(b.shset) - len(list_distinct(list_intersect(a.shset, b.shset))))", 4)} >= 0.5 AS jaccard_dup,
       |         bit_count(xor(sa.sh, sb.sh)) <= 3 AS simhash_dup
       |  FROM cand c
       |  JOIN chash ha ON c.id_a = ha.doc_id
       |  JOIN chash hb ON c.id_b = hb.doc_id
       |  JOIN sets a ON c.id_a = a.doc_id
       |  JOIN sets b ON c.id_b = b.doc_id
       |  JOIN simh sa ON c.id_a = sa.doc_id
       |  JOIN simh sb ON c.id_b = sb.doc_id)
       |SELECT exact_dup, jaccard_dup, simhash_dup,
       |       CAST(count(*) AS BIGINT) AS n_pairs
       |FROM verdicts GROUP BY 1, 2, 3""".stripMargin
  }) { (s, d) =>
    import graft.text.NearDup
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val cands = NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
      .select("id_a", "id_b").localCheckpoint(true)
    val jac = NearDup.jaccardOnPairs(docs, cands, "doc_id", col("text"), 3)
    val chash = docs.select(col("doc_id"),
      TextAnalysis.normalizedHash(col("text")).as("ch"))
    val toksDf = docs
      // single-row-group input (guide §2.5): spread the explode-heavy compute
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tk"))
    val simh = NearDup.simhash16(toksDf, "doc_id", "tk")
    jac
      .join(chash.select(col("doc_id").as("id_a"), col("ch").as("cha")), Seq("id_a"))
      .join(chash.select(col("doc_id").as("id_b"), col("ch").as("chb")), Seq("id_b"))
      .join(simh.select(col("doc_id").as("id_a"), col("simhash").as("sa")), Seq("id_a"))
      .join(simh.select(col("doc_id").as("id_b"), col("simhash").as("sb")), Seq("id_b"))
      .select(
        (col("cha") === col("chb")).as("exact_dup"),
        (col("jaccard") >= 0.5).as("jaccard_dup"),
        (bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3).as("simhash_dup"))
      .groupBy("exact_dup", "jaccard_dup", "simhash_dup")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** G13 — degree distribution of the covisitation graph (g6's edges),
    * log2-binned: the one-line diagnostic that says whether downstream
    * graph work (g9 PageRank, g10 triangles) will hit hub skew. Degree =
    * count over edges in both directions; binning is integer bit math —
    * engine-exact. */
  val g13DegreeHistogram = q("g13_degree_histogram",
    """WITH it AS (
      |  SELECT DISTINCT user_id,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS item
      |  FROM events),
      |edges AS (
      |  SELECT a.item AS i1, b.item AS i2
      |  FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS degree
      |  FROM (SELECT i1 AS node FROM edges UNION ALL SELECT i2 FROM edges)
      |  GROUP BY 1)
      |SELECT CAST(floor(log2(degree)) AS INT) AS degree_bin,
      |       CAST(count(*) AS BIGINT) AS n_nodes,
      |       CAST(min(degree) AS BIGINT) AS min_degree,
      |       CAST(max(degree) AS BIGINT) AS max_degree
      |FROM deg GROUP BY 1""".stripMargin) { (s, d) =>
    val it = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .distinct()
    val edges = it.groupBy("user_id")
      .agg(sort_array(collect_set(col("item"))).as("a"))
      .select(explode(expr(
        "flatten(transform(a, (x, i) -> transform(slice(a, i + 2, size(a)), " +
          "y -> named_struct('i1', x, 'i2', y))))")).as("p"))
      .groupBy(col("p.i1").as("i1"), col("p.i2").as("i2"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 3)
    val deg = edges.select(col("i1").as("node"))
      .unionAll(edges.select(col("i2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.groupBy(floor(log2(col("degree"))).cast("int").as("degree_bin"))
      .agg(count(lit(1)).as("n_nodes"),
        min("degree").as("min_degree"), max("degree").as("max_degree"))
  }

  val all: Seq[Q] = Seq(t31TokenBudget, t32NgramNovelty, d20MethodAgreement,
    g13DegreeHistogram)
}
