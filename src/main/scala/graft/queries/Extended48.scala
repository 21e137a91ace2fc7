package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 48: objective-building text corruption and
  * table reconciliation.
  */
object Extended48 {

  /** T36 — T5-style span corruption (Raffel et al. JMLR'20): the
    * masked-span objective builder that turns raw documents into
    * (input, target) training pairs. Tokens partition into blocks of 5;
    * block b masks its first k tokens (k = hash(doc, b) mod 3, so ~⅓ of
    * blocks mask nothing) behind a single `<extra_id_b>` sentinel; the
    * target is the sentinel-delimited sequence of masked spans. The
    * pair is entirely hash-derived — both engines build identical
    * strings, checked via md5 (the row carries digests, not the pair
    * text, to keep the battery output bounded).
    *
    * Shape at scale: pure array-local string work (transform/flatten/
    * array_join HOFs) — zero shuffles, composes with pushdown; exactly
    * the map-stage shape of a production objective-building pass. */
  val t36SpanCorruption = q("t36_span_corruption",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |blocks AS (
      |  SELECT doc_id, t,
      |         CAST(ceil(len(t) / 5.0) AS INT) AS nb
      |  FROM tok WHERE len(t) > 0),
      |built AS (
      |  SELECT doc_id, nb,
      |         list_transform(generate_series(0, nb - 1), b ->
      |           ('0x' || substr(md5('sp:' || CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 3) AS ks,
      |         t
      |  FROM blocks),
      |parts AS (
      |  SELECT doc_id, nb, ks, t,
      |         -- NB: DuckDB t[a:b] with a > len(t) is NULL, not [] — the
      |         -- empty-remainder case must be guarded, not concatenated
      |         list_transform(generate_series(0, nb - 1), b ->
      |           CASE WHEN ks[CAST(b + 1 AS INT)] > 0
      |                THEN '<extra_id_' || CAST(b AS VARCHAR) || '>' ||
      |                     CASE WHEN b * 5 + ks[CAST(b + 1 AS INT)] + 1 <= len(t)
      |                          THEN ' ' || array_to_string(t[CAST(b * 5 + ks[CAST(b + 1 AS INT)] + 1 AS INT):CAST(b * 5 + 5 AS INT)], ' ')
      |                          ELSE '' END
      |                ELSE array_to_string(t[CAST(b * 5 + 1 AS INT):CAST(b * 5 + 5 AS INT)], ' ')
      |           END) AS inp_parts,
      |         list_transform(generate_series(0, nb - 1), b ->
      |           CASE WHEN ks[CAST(b + 1 AS INT)] > 0
      |                THEN '<extra_id_' || CAST(b AS VARCHAR) || '> ' ||
      |                     array_to_string(t[CAST(b * 5 + 1 AS INT):CAST(b * 5 + ks[CAST(b + 1 AS INT)] AS INT)], ' ')
      |                ELSE NULL
      |           END) AS tgt_parts
      |  FROM built)
      |SELECT doc_id, CAST(nb AS BIGINT) AS n_blocks,
      |       CAST(list_sum(list_transform(ks, k -> least(k, CAST(5 AS BIGINT)))) AS BIGINT) AS n_masked,
      |       md5(coalesce(array_to_string(list_filter(inp_parts, x -> x IS NOT NULL AND x <> ''), ' '), '')) AS input_md5,
      |       md5(coalesce(array_to_string(list_filter(tgt_parts, x -> x IS NOT NULL), ' '), '')) AS target_md5
      |FROM parts""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(trim(col("text")), "\\s+"), x => x =!= "").as("t"))
      .where(size(col("t")) > 0)
      .withColumn("nb", ceil(size(col("t")) / 5.0).cast("int"))
      .withColumn("ks", expr(
        """transform(sequence(0, nb - 1), b ->
          |  conv(substring(md5(concat('sp:', CAST(doc_id AS STRING), ':', CAST(b AS STRING))), 1, 8), 16, 10) % CAST(3 AS BIGINT))""".stripMargin))
      // one materialization: ks feeds three downstream HOF columns (see
      // t35 — interpreted HOFs re-run under projection collapse)
      .localCheckpoint(true)
    toks
      .withColumn("inp_parts", expr(
        """transform(sequence(0, nb - 1), b ->
          |  CASE WHEN ks[b] > 0
          |       THEN concat('<extra_id_', CAST(b AS STRING), '>',
          |                   IF(b * 5 + ks[b] + 1 <= size(t),
          |                      concat(' ', array_join(slice(t, b * 5 + ks[b] + 1, 5 - ks[b]), ' ')),
          |                      ''))
          |       ELSE array_join(slice(t, b * 5 + 1, 5), ' ')
          |  END)""".stripMargin))
      .withColumn("tgt_parts", expr(
        """transform(sequence(0, nb - 1), b ->
          |  CASE WHEN ks[b] > 0
          |       THEN concat('<extra_id_', CAST(b AS STRING), '> ',
          |                   array_join(slice(t, b * 5 + 1, ks[b]), ' '))
          |       ELSE NULL
          |  END)""".stripMargin))
      .select(col("doc_id"), col("nb").cast("long").as("n_blocks"),
        expr("CAST(aggregate(ks, 0L, (a, k) -> a + least(k, 5L)) AS BIGINT)").as("n_masked"),
        md5(array_join(expr("filter(inp_parts, x -> x IS NOT NULL AND x <> '')"), " ")).as("input_md5"),
        md5(array_join(expr("filter(tgt_parts, x -> x IS NOT NULL)"), " ")).as("target_md5"))
  }

  /** C13 — table diff / reconciliation (the Datafold-style data-contract
    * operator): two epochs of the orders table — "base" (a filtered,
    * price-perturbed snapshot, derived deterministically so the battery
    * is self-contained) and "current" — reconcile by key into
    * added / removed / changed / unchanged, with per-status counts and
    * key ranges. Change detection is a null-safe struct compare over the
    * value columns; the key-level full-outer join is the canonical diff
    * plan.
    *
    * Shape at scale: one co-keyed full-outer join + a 4-group aggregate;
    * both sides shuffle once on the key (or zero times if both epochs
    * share a bucketed layout — c9's contract). */
  val c13TableDiff = q("c13_table_diff",
    """WITH cur AS (
      |  SELECT o_orderkey AS k, o_orderpriority AS pri,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |base AS (
      |  -- yesterday's snapshot: rows with k%13=0 hadn't landed yet
      |  -- (→ added today), k%17=0 have since been deleted (→ removed),
      |  -- and k%11=0 had a price 1 cent lower (→ changed)
      |  SELECT k, pri,
      |         cents - CASE WHEN k % 11 = 0 THEN 1 ELSE 0 END AS cents
      |  FROM cur WHERE k % 13 <> 0
      |  UNION ALL
      |  SELECT k + 1000000000, pri, cents FROM cur WHERE k % 17 = 0),
      |d AS (
      |  SELECT CASE
      |           WHEN b.k IS NULL THEN 'added'
      |           WHEN c.k IS NULL THEN 'removed'
      |           WHEN b.pri IS DISTINCT FROM c.pri
      |             OR b.cents IS DISTINCT FROM c.cents THEN 'changed'
      |           ELSE 'unchanged'
      |         END AS status,
      |         coalesce(c.k, b.k) AS k
      |  FROM base b FULL OUTER JOIN cur c ON b.k = c.k)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |       min(k) AS min_key, max(k) AS max_key
      |FROM d GROUP BY 1""".stripMargin) { (s, d) =>
    val cur = Tables.orders(s, d).select(
      col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val base = cur.where(col("k") % 13 =!= 0)
      .select(col("k"), col("pri"),
        (col("cents") - when(col("k") % 11 === 0, 1L).otherwise(0L)).as("cents"))
      .unionAll(cur.where(col("k") % 17 === 0)
        .select((col("k") + 1000000000L).as("k"), col("pri"), col("cents")))
    base.as("b").join(cur.as("c"), col("b.k") === col("c.k"), "full_outer")
      .select(
        when(col("b.k").isNull, "added")
          .when(col("c.k").isNull, "removed")
          .when(!(col("b.pri") <=> col("c.pri")) ||
            !(col("b.cents") <=> col("c.cents")), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("c.k"), col("b.k")).as("k"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), min("k").as("min_key"), max("k").as("max_key"))
  }

  val all: Seq[Q] = Seq(t36SpanCorruption, c13TableDiff)
}
