package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 51: diversity-constrained ranking. */
object Extended51 {

  /** W17 — diversified top-k (global top-10 with a ≤2-per-source cap):
    * the search-results-page constraint — rank candidates globally, but
    * no source may occupy more than 2 slots, so lower-scored documents
    * from under-represented sources displace a dominant source's #3.
    * Two windows compose: a per-source rank prunes each source to its
    * best 2, then the global rank picks 10 from the survivors. Scoring
    * is the integer term-frequency relevance (v25's lexical leg) so
    * ranks are robustly deterministic.
    *
    * Shape at scale: the per-source cap is a partitioned window (fully
    * parallel) that shrinks the global-rank input to ≤2·|sources| rows —
    * the global window runs on a dim-sized survivor set, never the
    * corpus. */
  val w17DiversifiedTopk = q("w17_diversified_topk",
    """WITH tok AS (
      |  SELECT doc_id, source,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, source,
      |         len(list_filter(t, x -> x = 'dup'))
      |       + len(list_filter(t, x -> x = 'vector'))
      |       + len(list_filter(t, x -> x = 'spark')) AS score
      |  FROM tok),
      |capped AS (
      |  SELECT doc_id, source, score,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY score DESC, doc_id ASC) AS sr
      |  FROM scored QUALIFY sr <= 2)
      |SELECT doc_id, source, CAST(score AS BIGINT) AS score,
      |       CAST(sr AS INT) AS source_rank,
      |       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
      |FROM capped QUALIFY rank <= 10""".stripMargin) { (s, d) =>
    val toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")
    def cnt(term: String) = size(filter(col("t"), x => x === term))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), toks.as("t"))
      .select(col("doc_id"), col("source"),
        (cnt("dup") + cnt("vector") + cnt("spark")).as("score"))
      .withColumn("sr", row_number().over(
        Window.partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)))
      .where(col("sr") <= 2)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .where(col("rank") <= 10)
      .select(col("doc_id"), col("source"), col("score").cast("long").as("score"),
        col("sr").cast("int").as("source_rank"), col("rank").cast("int").as("rank"))
  }

  val all: Seq[Q] = Seq(w17DiversifiedTopk)
}
