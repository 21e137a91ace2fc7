package graft.queries

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

  val all: Seq[Q] = Seq(d11SegmentDedup, t21MixWeights)
}
