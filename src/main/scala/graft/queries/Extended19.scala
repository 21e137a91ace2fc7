package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.vec.Similarity

/** Round-2 widening, part 19: byte-exact binary statistics, event-type
  * Markov transitions, and the staged-retrieval recall audit.
  */
object Extended19 {

  /** M5 — byte-exact payload statistics over the encoded binary column:
    * byte count, integer byte checksum, distinct-symbol count and
    * min/max symbol — the content-integrity fingerprint a multimodal
    * ingest keeps next to m1's md5 (checksums survive format migration;
    * md5 alone can't localize WHERE corruption hit). Text here is ASCII
    * so codepoints ≡ bytes and the checksum is engine-exact integer
    * arithmetic.
    *
    * Shape at scale: all measures are array-local per row (split →
    * fold) — scan-bound, zero shuffle, and the per-element loop is a
    * codegen'd higher-order function, not a UDF. */
  val m5ByteStats = q("m5_byte_stats",
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(list_sum(list_transform(string_split(text, ''), x -> ord(x)))
      |            AS BIGINT) AS byte_sum,
      |       CAST(len(list_distinct(string_split(text, ''))) AS BIGINT)
      |         AS n_symbols,
      |       list_min(string_split(text, '')) AS min_symbol,
      |       list_max(string_split(text, '')) AS max_symbol
      |FROM documents""".stripMargin) { (s, d) =>
    // Spark's split keeps a trailing "" (Java split limit -1); drop it so
    // symbol sets match the clean per-char split
    val chars = filter(split(col("text"), ""), c => c =!= "")
    Tables.documents(s, d).select(col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      aggregate(chars, lit(0L), (acc, c) => acc + ascii(c)).as("byte_sum"),
      size(array_distinct(chars)).cast("long").as("n_symbols"),
      array_min(chars).as("min_symbol"),
      array_max(chars).as("max_symbol"))
  }

  /** G11 — event-type Markov transition matrix: per (from, to) event-type
    * pair, the transition count and row-conditional probability — the
    * first-order behavioral model (next-action prediction baselines,
    * anomaly scoring for improbable jumps) built from each user's
    * time-ordered stream. Deterministic: the sequence order is the unique
    * (ts, event_id); probabilities divide exact integer counts.
    *
    * Shape at scale: ONE keyed shuffle (user window for lag), then the
    * transition rollup is 25 rows — the from-type totals join broadcasts.
    */
  val g11MarkovTransitions = q("g11_markov_transitions",
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |         lag(event_type) OVER (PARTITION BY user_id
       |                               ORDER BY ts, event_id) AS prev_type
       |  FROM events),
       |trans AS (
       |  SELECT prev_type AS from_type, event_type AS to_type,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |tot AS (SELECT from_type, sum(n) AS row_total FROM trans GROUP BY 1)
       |SELECT t.from_type, t.to_type, t.n,
       |       ${rnd("CAST(t.n AS DOUBLE) / tt.row_total", 4)} AS p
       |FROM trans t JOIN tot tt ON t.from_type = tt.from_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("from_type").agg(sum("n").as("row_total"))
    trans.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_total"), 4).as("p"))
  }

  /** V17 — staged-retrieval recall audit: how much of the TRUE full-dim
    * top-10 (v1's brute force) does v16's coarse-then-rerank pipeline
    * recover, and how deep into the coarse ranking the true neighbours
    * sit (the efSearch/candidate-budget dial: if max_coarse_rank ≤ 100,
    * a 100-candidate budget has recall 1.0). The per-neighbour coarse
    * rank is computed as a COUNT against the corpus — never a global
    * row_number window over all vectors.
    *
    * Composes v16 verbatim; scores rounded before ranking as everywhere
    * in the v-family. */
  val v17StagedRecall = q("v17_staged_recall",
    s"""WITH v AS (
       |  SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
       |n16 AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v WHERE i <= 16 GROUP BY 1),
       |n64 AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v GROUP BY 1),
       |coarse AS (
       |  SELECT c.vec_id,
       |         ${rnd("sum(q.x * c.x) / (nq.nrm * nc.nrm)", 3)} AS ccos
       |  FROM v c
       |  JOIN v q ON q.vec_id = 7 AND q.i = c.i AND q.i <= 16
       |  JOIN n16 nq ON nq.vec_id = 7
       |  JOIN n16 nc ON nc.vec_id = c.vec_id
       |  WHERE c.vec_id <> 7 AND c.i <= 16
       |  GROUP BY 1, nq.nrm, nc.nrm),
       |exact AS (
       |  SELECT c.vec_id,
       |         ${rnd("sum(q.x * c.x) / (nq.nrm * nc.nrm)", 3)} AS fcos
       |  FROM v c
       |  JOIN v q ON q.vec_id = 7 AND q.i = c.i
       |  JOIN n64 nq ON nq.vec_id = 7
       |  JOIN n64 nc ON nc.vec_id = c.vec_id
       |  WHERE c.vec_id <> 7
       |  GROUP BY 1, nq.nrm, nc.nrm),
       |true10 AS (
       |  SELECT vec_id, fcos,
       |         row_number() OVER (ORDER BY fcos DESC, vec_id ASC) AS rn
       |  FROM exact QUALIFY rn <= 10),
       |cand AS (
       |  SELECT vec_id,
       |         row_number() OVER (ORDER BY ccos DESC, vec_id ASC) AS crn
       |  FROM coarse QUALIFY crn <= 100),
       |rerank AS (
       |  SELECT e.vec_id,
       |         row_number() OVER (ORDER BY e.fcos DESC, e.vec_id ASC) AS rrn
       |  FROM exact e JOIN cand c ON c.vec_id = e.vec_id
       |  QUALIFY rrn <= 10),
       |ranks AS (
       |  SELECT t.vec_id,
       |         (SELECT count(*) FROM coarse c2, coarse ct
       |          WHERE ct.vec_id = t.vec_id
       |            AND (c2.ccos > ct.ccos
       |                 OR (c2.ccos = ct.ccos AND c2.vec_id <= ct.vec_id)))
       |           AS coarse_rank
       |  FROM true10 t)
       |SELECT CAST((SELECT count(*) FROM rerank r JOIN true10 t USING (vec_id))
       |            AS BIGINT) AS staged_hits,
       |       ${rnd("(SELECT count(*) FROM rerank r JOIN true10 t USING (vec_id)) / 10.0", 2)}
       |         AS recall_at_10,
       |       CAST((SELECT max(coarse_rank) FROM ranks) AS BIGINT)
       |         AS max_coarse_rank_needed""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("cv"))
    val qrow = emb.where(col("vec_id") === 7)
      .select(col("cv").as("qv"), slice(col("cv"), 1, 16).as("qv16"))
    val corpus = emb.where(col("vec_id") =!= 7)
      .withColumn("cv16", slice(col("cv"), 1, 16))
    val scored = corpus.crossJoin(broadcast(qrow))
      .withColumn("ccos", round(
        Similarity.dot(col("qv16"), col("cv16")) /
          (Similarity.norm(col("qv16")) * Similarity.norm(col("cv16"))), 3))
      .withColumn("fcos", round(
        Similarity.dot(col("qv"), col("cv")) /
          (Similarity.norm(col("qv")) * Similarity.norm(col("cv"))), 3))
      .select("vec_id", "ccos", "fcos")
      .localCheckpoint(true) // feeds true10, cand, and the rank counts
    val true10 = scored.orderBy(col("fcos").desc, col("vec_id").asc).limit(10)
      .select(col("vec_id"), col("ccos"))
    val cand = scored.orderBy(col("ccos").desc, col("vec_id").asc).limit(100)
      .select(col("vec_id"))
    val rerank = scored.join(cand, Seq("vec_id"))
      .orderBy(col("fcos").desc, col("vec_id").asc).limit(10)
      .select(col("vec_id"))
    val hits = rerank.join(true10, Seq("vec_id")).agg(count(lit(1)).as("staged_hits"))
    // coarse rank of each true neighbour = broadcast-joined count vs the
    // corpus (10 × N comparisons, partial-aggregated — no global window)
    val ranks = scored.as("c2").crossJoin(broadcast(true10.as("t")))
      .where(col("c2.ccos") > col("t.ccos") ||
        (col("c2.ccos") === col("t.ccos") && col("c2.vec_id") <= col("t.vec_id")))
      .groupBy(col("t.vec_id"))
      .agg(count(lit(1)).as("coarse_rank"))
      .agg(max("coarse_rank").as("max_coarse_rank_needed"))
    hits.crossJoin(broadcast(ranks))
      .select(col("staged_hits"),
        round(col("staged_hits") / lit(10.0), 2).as("recall_at_10"),
        col("max_coarse_rank_needed"))
  }

  val all: Seq[Q] = Seq(m5ByteStats, g11MarkovTransitions, v17StagedRecall)
}
