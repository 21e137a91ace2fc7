package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 16: PQ asymmetric-distance search (completing
  * the IVF-PQ story v14 started), lexical-diversity quality screening,
  * and the Zipf rank-frequency profile.
  */
object Extended16 {

  /** V15 — PQ asymmetric-distance (ADC) top-k search: approximate nearest
    * neighbours of one query vector computed entirely from v14's compact
    * PQ codes. The query builds a 4×10 lookup table (squared distance of
    * its sub-vector to every centroid's); each database vector's
    * approximate distance is then the sum of 4 table entries addressed by
    * its codes — the memory-bandwidth trick that lets a billion-vector
    * index fit in RAM (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011).
    *
    * Shape at scale: codes are 4 small ints per vector (16 bytes vs 256
    * for the raw floats); the LUT is 40 rows and broadcasts; the scan
    * never touches the embedding column after code assignment, and the
    * top-k is TakeOrderedAndProject on (rounded dist, vec_id). At 100 TB
    * the code table is the only thing read — 16× less IO than v1's
    * brute force, with v14's q_err quantifying the recall trade. */
  val v15PqAdc = q("v15_pq_adc_topk", {
    val sub = (0 until 4).map { b =>
      s"""list_sum(list_transform(generate_series(${b * 16 + 1}, ${b * 16 + 16}),
         |           i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) -
         |                 CAST(s.ce[CAST(i AS INT)] AS DOUBLE)) ^ 2)) AS dist$b""".stripMargin
    }.mkString(",\n         ")
    s"""WITH seeds AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id <= 10),
       |pairs AS (
       |  SELECT e.vec_id, s.cid,
       |         $sub
       |  FROM embeddings e CROSS JOIN seeds s),
       |long AS (
       |  SELECT vec_id, cid, CAST(u.b AS INT) AS b,
       |         CASE u.b WHEN 0 THEN dist0 WHEN 1 THEN dist1
       |                  WHEN 2 THEN dist2 ELSE dist3 END AS dist
       |  FROM pairs CROSS JOIN range(0, 4) u(b)),
       |codes AS (
       |  SELECT vec_id, b, cid,
       |         row_number() OVER (PARTITION BY vec_id, b
       |                            ORDER BY dist ASC, cid ASC) AS rn
       |  FROM long),
       |lut AS (
       |  SELECT cid, b, dist FROM long WHERE vec_id = 42),
       |adc AS (
       |  SELECT c.vec_id,
       |         max(CASE WHEN c.b = 0 THEN t.dist END) AS a0,
       |         max(CASE WHEN c.b = 1 THEN t.dist END) AS a1,
       |         max(CASE WHEN c.b = 2 THEN t.dist END) AS a2,
       |         max(CASE WHEN c.b = 3 THEN t.dist END) AS a3
       |  FROM codes c JOIN lut t ON c.b = t.b AND c.cid = t.cid
       |  WHERE c.rn = 1 AND c.vec_id <> 42
       |  GROUP BY 1)
       |SELECT vec_id, ${rnd("a0 + a1 + a2 + a3", 4)} AS adc_dist
       |FROM adc
       |ORDER BY ${rnd("a0 + a1 + a2 + a3", 4)} ASC, vec_id ASC
       |LIMIT 20""".stripMargin
  }) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
    val seeds = emb.where(col("vec_id") <= 10)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    def subDist(b: Int) =
      aggregate(zip_with(slice(col("v"), b * 16 + 1, 16), slice(col("c"), b * 16 + 1, 16),
        (a, x) => (a - x) * (a - x)), lit(0.0), (acc, x) => acc + x)
    val long = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cid"),
        posexplode(array((0 until 4).map(b => subDist(b)): _*)).as(Seq("b", "dist")))
      .localCheckpoint(true) // feeds both the code argmin and the query LUT
    // v14's partial-aggregable struct-min argmin (no window)
    val codes = long.where(col("vec_id") =!= 42)
      .groupBy("vec_id", "b")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("b"), col("m.cid").as("cid"))
    val lut = long.where(col("vec_id") === 42)
      .select(col("b"), col("cid"), col("dist"))
    val aggs = (0 until 4).map(b =>
      max(when(col("b") === b, col("dist"))).as(s"a$b"))
    codes.join(broadcast(lut), Seq("b", "cid"))
      .groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        round(col("a0") + col("a1") + col("a2") + col("a3"), 4).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(20)
  }

  /** T24 — lexical-diversity screen: per document, token/char volume,
    * type-token ratio, digit and single-char-token shares — the
    * vocabulary-richness quality gate (low TTR = boilerplate/spam; high
    * single-char share = tokenizer garbage) every corpus-curation recipe
    * runs next to t2's length/stopword heuristics. All ratios are exact
    * integer quotients, so the screen is engine-deterministic.
    *
    * Shape at scale: one pass, all measures array-local per document —
    * no explode, no shuffle except the parquet scan itself. */
  val t24LexicalDiversity = q("t24_lexical_diversity",
    s"""WITH tok AS (
       |  SELECT doc_id, lang, length(text) AS n_chars,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents)
       |SELECT doc_id, lang, n_chars,
       |       CAST(len(t) AS BIGINT) AS n_tokens,
       |       CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
       |       ${rnd("CAST(len(list_distinct(t)) AS DOUBLE) / len(t)", 4)} AS ttr,
       |       ${rnd("CAST(len(list_filter(t, x -> length(x) = 1)) AS DOUBLE) / len(t)", 4)} AS singlechar_ratio,
       |       ${rnd("CAST(len(list_filter(t, x -> regexp_matches(x, '^[0-9]+$$'))) AS DOUBLE) / len(t)", 4)} AS digit_ratio,
       |       (CAST(len(list_distinct(t)) AS DOUBLE) / len(t)) < 0.3 AS low_diversity
       |FROM tok""".stripMargin) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), length(col("text")).as("n_chars"),
        filter(split(trim(col("text")), "\\s+"), x => x =!= "").as("t"))
    tok.select(col("doc_id"), col("lang"), col("n_chars"),
      size(col("t")).cast("long").as("n_tokens"),
      size(array_distinct(col("t"))).cast("long").as("n_types"),
      round(size(array_distinct(col("t"))).cast("double") / size(col("t")), 4)
        .as("ttr"),
      round(size(filter(col("t"), x => length(x) === 1)).cast("double") /
        size(col("t")), 4).as("singlechar_ratio"),
      round(size(filter(col("t"), x => x.rlike("^[0-9]+$"))).cast("double") /
        size(col("t")), 4).as("digit_ratio"),
      (size(array_distinct(col("t"))).cast("double") / size(col("t")) < 0.3)
        .as("low_diversity"))
  }

  /** T25 — Zipf rank-frequency profile: corpus vocabulary ranked by
    * frequency (deterministic tie-break on the token), sampled at
    * doubling ranks 1,2,4,…,1024, with the local log-log slope between
    * consecutive profile points — the power-law exponent diagnostic
    * (Zipf's-law fit ⇒ slope ≈ −1) that flags synthetic or
    * template-generated corpora (too flat) and OCR noise (too steep
    * tail). Every measure is either an exact integer count or a
    * single-expression ln/division evaluated identically per row — no
    * FP accumulation, so the profile is engine-exact.
    *
    * Shape at scale: token counting is one partial-aggregated shuffle;
    * the global rank is a window over the VOCABULARY (not the corpus),
    * and the profile output is 11 rows. */
  val t25ZipfProfile = q("t25_zipf_profile",
    s"""WITH tf AS (
       |  SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
       |                            x -> x <> '')) AS token
       |  FROM documents),
       |vocab AS (SELECT token, count(*) AS freq FROM tf GROUP BY 1),
       |ranked AS (
       |  SELECT token, freq,
       |         row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
       |  FROM vocab),
       |prof AS (
       |  SELECT rank, token, freq,
       |         lag(rank) OVER (ORDER BY rank) AS prank,
       |         lag(freq) OVER (ORDER BY rank) AS pfreq
       |  FROM ranked
       |  WHERE rank IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024))
       |SELECT CAST(rank AS BIGINT) AS rank, token, CAST(freq AS BIGINT) AS freq,
       |       ${rnd("ln(CAST(freq AS DOUBLE))", 6)} AS ln_freq,
       |       CASE WHEN prank IS NULL THEN NULL
       |            ELSE ${rnd(
                 "(ln(CAST(freq AS DOUBLE)) - ln(CAST(pfreq AS DOUBLE))) / " +
                 "(ln(CAST(rank AS DOUBLE)) - ln(CAST(prank AS DOUBLE)))", 4)}
       |       END AS local_slope
       |FROM prof""".stripMargin) { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(explode(filter(split(trim(col("text")), "\\s+"),
        x => x =!= "")).as("token"))
    val vocab = tf.groupBy("token").agg(count(lit(1)).as("freq"))
    // global rank over the vocabulary-sized table only — acceptable
    // single-partition window because |vocab| << corpus (t10's argument)
    val ranked = vocab.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token").asc)))
    val marks = Seq(1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
    val w = Window.orderBy("rank")
    val prof = ranked.where(col("rank").isin(marks: _*))
      .withColumn("prank", lag("rank", 1).over(w))
      .withColumn("pfreq", lag("freq", 1).over(w))
    prof.select(col("rank").cast("long").as("rank"), col("token"),
      col("freq").cast("long").as("freq"),
      round(log(col("freq").cast("double")), 6).as("ln_freq"),
      when(col("prank").isNull, lit(null))
        .otherwise(round(
          (log(col("freq").cast("double")) - log(col("pfreq").cast("double"))) /
            (log(col("rank").cast("double")) - log(col("prank").cast("double"))), 4))
        .as("local_slope"))
  }

  val all: Seq[Q] = Seq(v15PqAdc, t24LexicalDiversity, t25ZipfProfile)
}
