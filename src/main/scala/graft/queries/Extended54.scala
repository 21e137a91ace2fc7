package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.NearDup

/** Round-4 widening, part 54: adversarial-scale dedup hardening. */
object Extended54 {

  private val boiler =
    "standard boilerplate terms of service apply to all content on this page"

  /** D22 — LSH hot-bucket cap under adversarial collision density: the
    * corpus is `documents` with every 7th doc's text REPLACED by one fixed
    * boilerplate string, planting a degenerate bucket holding ~n/7 of the
    * corpus in EVERY band (the real-world failure mode: empty pages, UI
    * chrome, license headers). Uncapped, that bucket alone contributes
    * O((n/7)²) candidate pairs per band — the quadratic blowup that turns
    * LSH into all-pairs at 100 TB. With `maxBucket = 5`, each (band,
    * bucket) keeps the 5 members with the smallest md5(band ‖ ":cap:" ‖
    * id) rank — deterministic, engine-portable, and band-dependent so
    * each band samples a different 5 — bounding the hot bucket at
    * C(5,2) = 10 pairs per band while genuine small-bucket near-dup pairs
    * are untouched. The oracle mirrors the ranked truncation exactly
    * (row_number over the same md5 key), so the hash check pins both the
    * SELECTION and the pair set, not just the count.
    *
    * Shape at scale: the cap is applied before collect_list via a window
    * on the same (band, h) partitioning the bucket groupBy needs — one
    * shuffle total, and no bucket array ever exceeds the cap
    * (`NearDup.lshCandidatesFromSigs`). */
  val d22BucketCap = q("d22_lsh_bucket_cap",
    s"""WITH docs2 AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 7 = 0 THEN '$boiler' ELSE text END AS text
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM docs2),
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
       |ranked AS (
       |  SELECT doc_id, band, h,
       |         row_number() OVER (
       |           PARTITION BY band, h
       |           ORDER BY md5(CAST(band AS VARCHAR) || ':cap:' || CAST(doc_id AS VARCHAR)),
       |                    doc_id) AS rk
       |  FROM sigs),
       |kept AS (SELECT doc_id, band, h FROM ranked WHERE rk <= 5)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_bands
       |FROM kept a JOIN kept b ON a.band = b.band AND a.h = b.h
       |WHERE a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, lit(boiler)).otherwise(col("text")).as("text"))
    NearDup.lshCandidates(docs, "doc_id", col("text"), n = 3, k = 8, bands = 8,
      maxBucket = 5)
  }

  val all: Seq[Q] = Seq(d22BucketCap)
}
