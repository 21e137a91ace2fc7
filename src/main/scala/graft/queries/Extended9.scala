package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 9: segment-level (line-level) corpus dedup with
  * document reassembly, and temperature-based source mixing — the two
  * remaining staples of a web-scale pretraining curation stack
  * (RefinedWeb/C4-style line dedup; GPT-3/Pile-style mixture weights).
  */
object Extended9 {

  /** D11 — segment-level exact dedup with keep-first and document
    * reassembly: split each document into consecutive 10-token segments,
    * drop every segment whose exact content already occurred earlier in
    * the corpus (global order = (doc_id, seg_idx)), then rebuild each
    * document from its surviving segments. This is line-level dedup à la
    * RefinedWeb §3.2 / C4 — the granularity that removes boilerplate
    * (headers, nav bars) exact-doc dedup (d1) can't see.
    *
    * Shape at scale: one shuffle, on the segment content itself (the
    * window partition key); the reassembly groupBy(doc_id) is the second.
    * Segments are bounded (10 tokens) so the state per window partition
    * is bounded; skew on a mega-duplicated segment is capped because the
    * window only computes row_number (streaming, no buffering of the
    * whole partition). */
  val d11SegmentDedup = q("d11_segment_dedup",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |seg AS (
      |  SELECT doc_id, i AS seg_idx,
      |         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS seg
      |  FROM (SELECT doc_id, t,
      |               unnest(generate_series(0, CAST(floor((len(t)-1)/10.0) AS INT))) AS i
      |        FROM tok WHERE len(t) > 0)),
      |flagged AS (
      |  SELECT doc_id, seg_idx, seg,
      |         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1 AS keep
      |  FROM seg)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_segs,
      |       CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
      |       coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY seg_idx), '') AS dedup_text
      |FROM flagged GROUP BY 1""".stripMargin) { (s, d) =>
    val toks = split(trim(col("text")), "\\s+")
    val segIdx = expr("sequence(0, int(floor((size(__t) - 1) / 10.0)))")
    val segs = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("__t"))
      .where(size(col("__t")) > 0)
      .select(col("doc_id"), posexplode(
        transform(segIdx,
          i => array_join(slice(col("__t"), i * 10 + 1, lit(10)), " ")))
        .as(Seq("seg_idx", "seg")))
    val firstSeen = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    segs.withColumn("keep", row_number().over(firstSeen) === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("keep"), 1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(
            when(col("keep"), struct(col("seg_idx"), col("seg"))))),
          kv => kv.getField("seg"))).as("dedup_text"))
  }

  /** T21 — temperature-based source mixing (mixture-weight resampling):
    * per-source sampling quotas proportional to count^0.5 (temperature
    * T=2 down-weights the head, up-weights the tail — the Pile/GPT-3
    * multinomial trick), then a deterministic hash-ranked pick of each
    * source's quota. All quota arithmetic is INTEGER (floor(sqrt·1e6) and
    * integer division) so Spark and the oracle agree bit-for-bit — no FP
    * summation-order hazard.
    *
    * Shape at scale: the quota table is per-source (tiny, broadcast);
    * the pick is one window shuffle on source. The hash rank makes the
    * sample reproducible under any partitioning and any executor count —
    * the property `TABLESAMPLE`/`rand()` never give. */
  val t21MixWeights = q("t21_mix_weights",
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |w AS (SELECT source, CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS ws FROM c),
      |q AS (SELECT source, CAST((300 * ws) // (SELECT CAST(sum(ws) AS BIGINT) FROM w) AS BIGINT) AS quota FROM w),
      |r AS (SELECT doc_id, source,
      |             row_number() OVER (PARTITION BY source
      |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |      FROM documents)
      |SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS rn, q.quota
      |FROM r JOIN q USING (source) WHERE r.rn <= q.quota""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val weights = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .select(col("source"),
        floor(sqrt(col("n")) * 1000000).cast("long").as("ws"))
    val denom = weights.agg(sum("ws").as("denom"))
    val quotas = weights.crossJoin(broadcast(denom))
      .select(col("source"), expr("(300 * ws) div denom").as("quota"))
    val ranked = docs.select(col("doc_id"), col("source"),
      row_number().over(Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).as("rn"))
    ranked.join(broadcast(quotas), Seq("source"))
      .where(col("rn") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"),
        col("quota"))
  }

  /** V12 — SemDeDup (semantic dedup, Abbas et al. 2023): assign every
    * embedding to its nearest of k seed centroids, rank within each
    * cluster by distance-to-centroid, and drop any vector whose cosine
    * similarity to an earlier-ranked cluster-mate is >= 0.35 (greedy
    * keep-first in centroid-proximity order — the released SemDeDup
    * implementation's policy). Catches paraphrase/translation duplicates
    * that MinHash (d2/d3) and SimHash (d4) can't see.
    *
    * Shape at scale: the codebook broadcasts (k is chosen so clusters
    * stay ~10³ docs — at 100 TB that means k ~ 10⁵, still a broadcast);
    * the only shuffle is on centroid_id, and the quadratic pair phase is
    * bounded per cluster, never corpus-wide. Norms are computed once per
    * vector before the pair join; per-pair work is exactly one
    * codegen'd VecDot. */
  val v12SemDedup = q("v12_semdedup",
    """WITH seeds AS (
      |  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      |  FROM embeddings WHERE vec_id <= 10),
      |d AS (
      |  SELECT e.vec_id, s.cid,
      |         list_sum(list_transform(generate_series(1, 64),
      |           i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - s.ce[CAST(i AS INT)]) ^ 2)) AS dist,
      |         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings e CROSS JOIN seeds s),
      |assign AS (
      |  SELECT vec_id, cid, dist, v FROM
      |    (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d)
      |  WHERE rn = 1),
      |ranked AS (
      |  SELECT vec_id, cid, dist, v, sqrt(list_dot_product(v, v)) AS nrm,
      |         row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rk
      |  FROM assign),
      |dup AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM ranked a JOIN ranked b ON a.cid = b.cid AND a.rk < b.rk
      |  WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 3) >= 0.35)
      |SELECT r.vec_id, r.cid AS centroid_id, CAST(r.rk AS BIGINT) AS rk,
      |       (dup.vec_id IS NULL) AS keep
      |FROM ranked r LEFT JOIN dup ON dup.vec_id = r.vec_id""".stripMargin) { (s, d) =>
    import graft.vec.Similarity
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val seeds = emb.where(col("vec_id") <= 10)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val dist = aggregate(zip_with(col("v"), col("c"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cid").asc)
    val assign = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cid"), dist.as("dist"), col("v"))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1).drop("rn")
    val wRank = Window.partitionBy("cid").orderBy(col("dist").asc, col("vec_id").asc)
    val ranked = assign
      .withColumn("rk", row_number().over(wRank))
      .withColumn("nrm", Similarity.norm(col("v")))
    val earlier = ranked.select(col("cid"), col("rk").as("rka"),
      col("v").as("va"), col("nrm").as("na"))
    val dup = ranked.select(col("vec_id"), col("cid"), col("rk"), col("v"), col("nrm"))
      .join(earlier, Seq("cid"))
      .where(col("rka") < col("rk") &&
        round(Similarity.dot(col("va"), col("v")) / (col("na") * col("nrm")), 3) >= 0.35)
      .select("vec_id").distinct().withColumn("isdup", lit(true))
    ranked.join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").as("centroid_id"),
        col("rk").cast("long").as("rk"), col("isdup").isNull.as("keep"))
  }

  /** D13 — quality-aware duplicate-cluster survivor selection: within each
    * d6 connected-component dup cluster, keep the member with the highest
    * token count (tiebreak: lowest doc_id) and flag the rest for removal —
    * the policy step that turns a dup-graph into an actual curated corpus
    * (drop the truncated/boilerplate variants, keep the fullest copy).
    * Composes the verified d6 clustering verbatim (Spark: same
    * lshCandidates → connectedComponents; oracle: d6's recursive-CTE SQL
    * as a derived table), so the survivor choice is audited against an
    * independently-computed clustering.
    *
    * Shape at scale: clustering cost is d6's (bounded by the candidate
    * graph, not the corpus); the survivor pick adds one bounded window
    * over cluster_id — dup clusters are small by construction, so no
    * skewed partition. */
  val d13ClusterKeepBest = q("d13_cluster_keep_best",
    s"""WITH c AS (SELECT * FROM (${TextQueries.d6DupClusters.oracle.get}) t),
       |tok AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |                              x -> x <> '')) AS BIGINT) AS n_tok
       |  FROM documents)
       |SELECT c.doc_id, c.cluster_id, tok.n_tok,
       |       row_number() OVER (PARTITION BY c.cluster_id
       |         ORDER BY tok.n_tok DESC, c.doc_id) = 1 AS keep
       |FROM c JOIN tok USING (doc_id)""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = graft.text.NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
    val clusters = graft.text.DupClusters.connectedComponents(
      docs.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val ntok = docs.select(col("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"), x => x =!= ""))
        .cast("long").as("n_tok"))
    val w = Window.partitionBy("cluster_id").orderBy(col("n_tok").desc, col("doc_id").asc)
    clusters.join(ntok, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "n_tok", "keep")
  }

  /** M3 — audio-style fixed-window segmentation (the audio half of the
    * multimodal path, complementing m1 image-meta and m2 frame-sample):
    * each document's byte stream stands in for a PCM buffer; cut it into
    * 100-sample windows at a 50-sample hop (2× overlap, the standard STFT
    * frame layout) and emit per-window sample count, DC sum and energy
    * (Σx, Σx² — the exact-integer precursors of mean/RMS). Window starts
    * are GENERATED (sequence with hop), never filtered post-explode, so a
    * real decoder would touch each sample once per overlap factor and
    * dropped audio never gets decoded.
    *
    * Shape at scale: pure scan-side explode — zero shuffle, linear in
    * corpus bytes, whole-stage codegen throughout. The real-codec
    * version swaps the ascii() stand-in for a byte-buffer read inside
    * mapPartitions (graft.multimodal.BinaryOps.decode shape); the window
    * bookkeeping here is exactly what it would reuse. */
  val m3AudioWindows = q("m3_audio_windows",
    """WITH w AS (
      |  SELECT doc_id, text,
      |         unnest(generate_series(0, CAST(floor((length(text)-1)/50.0) AS INT))) AS widx
      |  FROM documents WHERE length(text) > 0),
      |seg AS (SELECT doc_id, widx, substring(text, CAST(widx*50+1 AS INT), 100) AS seg FROM w)
      |SELECT doc_id, CAST(widx AS INT) AS win_idx,
      |       CAST(length(seg) AS BIGINT) AS n_samples,
      |       CAST(list_sum(list_transform(generate_series(1, length(seg)),
      |              i -> ascii(substring(seg, CAST(i AS INT), 1)))) AS BIGINT) AS dc_sum,
      |       CAST(list_sum(list_transform(generate_series(1, length(seg)),
      |              i -> ascii(substring(seg, CAST(i AS INT), 1))
      |                   * ascii(substring(seg, CAST(i AS INT), 1)))) AS BIGINT) AS energy
      |FROM seg""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, int(floor((length(text)-1)/50.0)))")).as("win_idx"))
      .withColumn("seg", expr("substring(text, win_idx*50+1, 100)"))
      .withColumn("codes", expr("transform(sequence(1, length(seg)), i -> ascii(substring(seg, i, 1)))"))
      .select(col("doc_id"), col("win_idx").cast("int").as("win_idx"),
        length(col("seg")).cast("long").as("n_samples"),
        expr("aggregate(codes, 0L, (acc, x) -> acc + x)").as("dc_sum"),
        expr("aggregate(codes, 0L, (acc, x) -> acc + x * x)").as("energy"))
  }

  /** D14 — SimHash near-dup degree at PRODUCTION signature width: the d8
    * plan carried to a 64-bit signature in 4 × 16-bit chunks, each chunk
    * its own band key (65536 buckets per band vs d8's 16). Same pigeonhole
    * guarantee (hamming <= 3 ⇒ some chunk agrees), same exactly-once
    * first-agreeing-band emission, same per-doc degree output — but
    * bucket occupancy stays flat as the corpus grows, which the BENCH.md
    * scale probe shows is precisely where the 16-bit demo signature goes
    * quadratic. This query IS the scale path named in d8's scaladoc,
    * oracle-checked. */
  val d14Simhash64Hamming = q("d14_simhash64_hamming",
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\s+'),
      |                                    x -> x <> '')) AS tk
      |  FROM documents),
      |bits AS (
      |  SELECT doc_id,
      |""".stripMargin +
    (0 until 64).map { b =>
      val src = if (b < 32) s"md5(tk)" else s"md5('x' || tk)"
      val pos = (b % 32) + 1
      s"         sum(CASE WHEN substr($src, $pos, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n") +
    """
      |  FROM tok GROUP BY doc_id),
      |sig AS (SELECT doc_id,
      |""".stripMargin +
    (0 until 4).map { j =>
      "        CAST(" + (0 until 16).map(b =>
        s"(CASE WHEN s${j * 16 + b} > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ") +
      s" AS BIGINT) AS sh$j"
    }.mkString(",\n") +
    """
      |  FROM bits),
      |bands AS (
      |  SELECT doc_id, sh0, sh1, sh2, sh3, b,
      |         CASE b WHEN 0 THEN sh0 WHEN 1 THEN sh1 WHEN 2 THEN sh2 ELSE sh3 END AS key
      |  FROM sig CROSS JOIN range(0, 4) t(b)),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) +
      |         bit_count(xor(a.sh2, b.sh2)) + bit_count(xor(a.sh3, b.sh3)) AS hamming
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) +
      |        bit_count(xor(a.sh2, b.sh2)) + bit_count(xor(a.sh3, b.sh3)) <= 3
      |    AND a.b = (CASE WHEN a.sh0 = b.sh0 THEN 0 WHEN a.sh1 = b.sh1 THEN 1
      |                    WHEN a.sh2 = b.sh2 THEN 2 ELSE 3 END)),
      |deg AS (
      |  SELECT id_a AS doc_id, hamming FROM p
      |  UNION ALL
      |  SELECT id_b AS doc_id, hamming FROM p)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_neighbors,
      |       CAST(min(hamming) AS INT) AS min_hamming
      |FROM deg GROUP BY 1""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      // single-row-group input (guide §2.5): spread the explode-heavy compute
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(graft.text.TextAnalysis.tokens(col("text"))).as("tk"))
    // the signature table fans out into BOTH sides of the band self-join;
    // without materialization each side re-runs the whole tokenize → md5 →
    // 17-sum aggregation subtree (no exchange reuse across a broadcast
    // build side) — measured 20× slower than joining the materialized table
    val sig = graft.text.NearDup.simhash64Chunks(toks, "doc_id", "tk")
      .localCheckpoint(true)
    val bands = sig.withColumn("b", explode(sequence(lit(0), lit(3))))
      .withColumn("key", element_at(
        array(col("sh0"), col("sh1"), col("sh2"), col("sh3")), col("b") + 1))
    def side(s0: String): DataFrame => DataFrame = df =>
      df.select(col("b") +: col("key") +: (col("doc_id").as(s"id_$s0") +:
        (0 until 4).map(j => col(s"sh$j").as(s"${s0}$j"))): _*)
    val a = side("a")(bands)
    val bb = side("b")(bands)
    val hamming = (0 until 4).map(j =>
      bit_count(col(s"a$j").bitwiseXOR(col(s"b$j")))).reduce(_ + _)
    val firstBand = when(col("a0") === col("b0"), 0)
      .when(col("a1") === col("b1"), 1)
      .when(col("a2") === col("b2"), 2).otherwise(3)
    val pairs = a.join(bb, Seq("b", "key"))
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
  }

  val all: Seq[Q] = Seq(d11SegmentDedup, t21MixWeights, v12SemDedup,
    d13ClusterKeepBest, m3AudioWindows, d14Simhash64Hamming)
}
