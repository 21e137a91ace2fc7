package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 2 — training-data pipeline operators beyond the
  * round-1 dedup/similarity family: sliding-window document chunking,
  * corpus vocabulary building, stratified rebalancing, per-label embedding
  * centroids (mean pooling), and the k-means assignment step over a
  * broadcast codebook.
  */
object Training2 {

  /** T9 — sliding-window document chunking (50-token chunks, stride 40,
    * 10-token overlap): the context-window packing step before LLM
    * tokenization. Pure scan-side explode — each doc expands to
    * ceil(len/stride) rows with no shuffle; at 100 TB the output is
    * written partitioned by a hash of doc_id so downstream dedup of
    * chunks co-locates. */
  val t9Chunking = q("t9_doc_chunking",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, t, unnest(generate_series(1, len(t), 40)) AS start FROM tok)
      |SELECT doc_id, CAST((start - 1) // 40 AS INT) AS chunk_idx,
      |       CAST(len(t[start:start+49]) AS INT) AS n_tokens,
      |       md5(array_to_string(t[start:start+49], ' ')) AS chunk_md5
      |FROM st""".stripMargin) { (s, d) =>
    val toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("t"))
      .withColumn("start", explode(sequence(lit(1), size(col("t")), lit(40))))
      .select(col("doc_id"),
        expr("(start - 1) div 40").cast("int").as("chunk_idx"),
        size(slice(col("t"), col("start"), lit(50))).as("n_tokens"),
        md5(array_join(slice(col("t"), col("start"), lit(50)), " ")).as("chunk_md5"))
  }

  /** T10 — corpus vocabulary with frequency ranks: explode tokens, count,
    * rank by (count desc, token asc). The token count is map-side
    * combinable; the final rank is a single-partition window over the
    * VOCABULARY (small by Zipf's law even at 100 TB of text — ranking
    * the types, not the tokens). */
  val t10Vocab = q("t10_vocab_ranks",
    """WITH tok AS (
      |  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |w AS (SELECT unnest(t) AS token FROM tok)
      |SELECT token, CAST(count(*) AS BIGINT) AS n,
      |       CAST(row_number() OVER (ORDER BY count(*) DESC, token ASC) AS INT) AS rank
      |FROM w GROUP BY token""".stripMargin) { (s, d) =>
    val toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")
    val counts = Tables.documents(s, d)
      .select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("token").asc)).cast("int"))
  }

  /** P6 — stratified rebalancing sample: deterministic md5-keyed keep
    * decision with per-stratum rates (downsample the dominant 'en' to
    * 25%, keep 75% of the rest) — the language-rebalancing pass of corpus
    * curation. Pure scan-side filter: no shuffle, reproducible across
    * engines and runs, and trivially push-down-able. */
  val p6StratifiedSample = q("p6_stratified_sample",
    """SELECT doc_id, lang FROM documents
      |WHERE CASE WHEN lang = 'en'
      |           THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
      |           ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' END""".stripMargin) { (s, d) =>
    val h1 = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(s, d)
      .where(when(col("lang") === "en", h1 < "4").otherwise(h1 < "c"))
      .select("doc_id", "lang")
  }

  /** V6 — per-label embedding centroid (mean pooling): dimension-wise
    * average, summarized as the centroid norm + first two coordinates.
    * The explode shuffles once on (label, dim) — at scale, mean pooling
    * is a partial-aggregable (sum, count) pair so map-side combine does
    * the heavy lifting; the 64-dim centroid table itself is tiny. */
  val v6LabelCentroids = q("v6_label_centroids",
    s"""WITH v AS (
       |  SELECT label, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
       |c AS (SELECT label, i, avg(x) AS cx, count(*) AS n FROM v GROUP BY 1, 2)
       |SELECT label, CAST(any_value(n) AS BIGINT) AS n_vecs,
       |       ${rnd("sqrt(sum(cx * cx))", 5)} AS centroid_norm,
       |       ${rnd("sum(CASE WHEN i = 1 THEN cx END)", 5)} AS c1,
       |       ${rnd("sum(CASE WHEN i = 2 THEN cx END)", 5)} AS c2
       |FROM c GROUP BY label""".stripMargin) { (s, d) =>
    val dims = Tables.embeddings(s, d)
      .select(col("label"), posexplode(graft.vec.Similarity.asDouble(col("embedding"))))
      .select(col("label"), (col("pos") + 1).as("i"), col("col").as("x"))
    val c = dims.groupBy("label", "i").agg(avg("x").as("cx"), count(lit(1)).as("n"))
    c.groupBy("label")
      .agg(first("n").as("n_vecs"),
        round(sqrt(sum(col("cx") * col("cx"))), 5).as("centroid_norm"),
        round(sum(when(col("i") === 1, col("cx"))), 5).as("c1"),
        round(sum(when(col("i") === 2, col("cx"))), 5).as("c2"))
  }

  /** V7 — k-means assignment step: every vector assigned to its nearest
    * of 10 seed centroids (vec_id ≤ 10) by squared L2, deterministic
    * centroid-id tiebreak. The codebook broadcasts (it is always tiny);
    * the fact side never shuffles — Lloyd's iteration at 100 TB is a
    * broadcast joint + map-side partial recompute of centroid sums. */
  val v7KmeansAssign = q("v7_kmeans_assign",
    s"""WITH seeds AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id <= 10),
       |pairs AS (
       |  SELECT e.vec_id, s.cid,
       |         list_sum(list_transform(generate_series(1, 64),
       |           i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) -
       |                 CAST(s.ce[CAST(i AS INT)] AS DOUBLE)) ^ 2)) AS dist
       |  FROM embeddings e CROSS JOIN seeds s),
       |ranked AS (
       |  SELECT vec_id, cid, dist,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
       |  FROM pairs)
       |SELECT vec_id, cid AS centroid_id, ${rnd("dist", 4)} AS dist_sq
       |FROM ranked WHERE rn = 1""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
    val seeds = emb.where(col("vec_id") <= 10)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val dist = aggregate(zip_with(col("v"), col("c"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cid").asc)
    emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cid"), dist.as("dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("centroid_id"),
        round(col("dist"), 4).as("dist_sq"))
  }

  val all: Seq[Q] = Seq(t9Chunking, t10Vocab, p6StratifiedSample,
    v6LabelCentroids, v7KmeansAssign)
}
