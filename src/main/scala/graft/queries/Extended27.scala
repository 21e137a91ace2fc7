package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.NearDup

/** Round-2 widening, part 27: weighted priority sampling, run-length
  * event compression, SQL-surface correlated scalar subqueries and
  * LATERAL joins, corpus-frequency boilerplate stripping, patch-hash
  * image near-dup, and incremental batch-vs-corpus dedup — the
  * production shape where a daily batch dedups against an existing
  * 100 TB corpus without recomputing it.
  */
object Extended27 {

  /** P11 — weighted priority sampling (Duffield–Lund–Thorup): priority
    * q_i = w_i / u_i with u_i a deterministic md5-derived uniform; the
    * sample is the top-k priorities. Inclusion probability ∝ weight
    * (n_chars — longer docs proportionally more likely), reproducible
    * across engines AND runs because u_i is a hash, not a PRNG.
    *
    * Cross-engine exactness: the priority is ONE IEEE-754 division of two
    * integer-exact doubles — correctly rounded per the standard, so Spark
    * and the oracle produce bit-identical keys (no pow/log in the sort
    * key, unlike textbook Efraimidis–Spirakis u^(1/w)).
    *
    * Scale shape: priorities are scan-side; the top-k is
    * TakeOrderedAndProject — per-partition heaps of k, only k rows per
    * partition reach the driver. No full sort, no shuffle of the corpus. */
  val p11PrioritySample = q("p11_priority_sample",
    """SELECT doc_id, n_chars,
      |       CAST(n_chars AS DOUBLE) /
      |       CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1 AS DOUBLE)
      |         AS priority
      |FROM documents
      |ORDER BY priority DESC, doc_id
      |LIMIT 100""".stripMargin) { (s, d) =>
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") + 1
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars").cast("double") / u.cast("double")).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(100)
  }

  /** E35 — run-length encoding of per-user event streams: consecutive
    * equal event_types collapse into one segment row (state-change
    * compression — the canonical way to shrink sensor/clickstream state
    * logs before warehousing). lag-based change flags + running sum give
    * segment ids; ordering is (ts, event_id) so ties are deterministic.
    * One shuffle on user_id; both windows and the final groupBy reuse it. */
  val e35RunLength = q("e35_run_length",
    """SELECT user_id, seg, event_type,
      |       CAST(count(*) AS BIGINT) AS run_len,
      |       min(ts) AS t_start, max(ts) AS t_end
      |FROM (
      |  SELECT user_id, ts, event_id, event_type,
      |         CAST(sum(chg) OVER (PARTITION BY user_id
      |                             ORDER BY ts, event_id) AS BIGINT) AS seg
      |  FROM (
      |    SELECT user_id, ts, event_id, event_type,
      |           CASE WHEN lag(event_type) OVER (PARTITION BY user_id
      |                                           ORDER BY ts, event_id)
      |                     = event_type THEN 0 ELSE 1 END AS chg
      |    FROM events))
      |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("chg",
        when(lag("event_type", 1).over(w) === col("event_type"), 0)
          .otherwise(1))
      .withColumn("seg", sum("chg").over(w))
      .groupBy(col("user_id"), col("seg"), col("event_type"))
      .agg(count(lit(1)).as("run_len"),
        min("ts").as("t_start"), max("ts").as("t_end"))
  }

  /** SQL surface — correlated scalar subqueries in the projection (the
    * form BI tools emit). Catalyst decorrelates each into an aggregated
    * left outer join; the COUNT-over-empty-group case yields 0, not NULL
    * (the classic "COUNT bug" — both engines get it right). */
  val sqlScalarSubquery = q("sql_scalar_subquery",
    """SELECT c.c_custkey, c.c_name,
      |       (SELECT count(*) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |       (SELECT max(o.o_totalprice) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c
      |WHERE c.c_acctbal > 9000""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("sql_ss_c")
    Tables.orders(s, d).createOrReplaceTempView("sql_ss_o")
    s.sql(
      """SELECT c.c_custkey, c.c_name,
        |       (SELECT count(*) FROM sql_ss_o o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |       (SELECT max(o.o_totalprice) FROM sql_ss_o o
        |        WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM sql_ss_c c
        |WHERE c.c_acctbal > 9000""".stripMargin)
  }

  /** SQL surface — LATERAL correlated subquery (SQL:1999 lateral derived
    * table): per-nation supplier stats computed by a subquery that
    * references the outer row. Catalyst plans a LateralJoin and
    * decorrelates the aggregate to a join+groupBy — same physical plan as
    * the hand-written form, but arriving via the parser path. */
  val sqlLateralAgg = q("sql_lateral_agg",
    s"""SELECT n.n_name, CAST(l.n_sup AS BIGINT) AS n_sup,
       |       ${rnd("l.total_bal", 2)} AS total_bal
       |FROM nation n,
       |LATERAL (SELECT count(*) AS n_sup, coalesce(sum(s_acctbal), 0) AS total_bal
       |         FROM supplier s WHERE s.s_nationkey = n.n_nationkey) l""".stripMargin) { (s, d) =>
    Tables.nation(s, d).createOrReplaceTempView("sql_lat_n")
    Tables.supplier(s, d).createOrReplaceTempView("sql_lat_s")
    s.sql(
      """SELECT n.n_name, l.n_sup, round(l.total_bal, 2) AS total_bal
        |FROM sql_lat_n n,
        |LATERAL (SELECT count(*) AS n_sup, coalesce(sum(s_acctbal), 0) AS total_bal
        |         FROM sql_lat_s s WHERE s.s_nationkey = n.n_nationkey) l""".stripMargin)
  }

  /** T29 — corpus-frequency boilerplate stripping (C4/RefinedWeb family):
    * a 10-token segment repeated across ≥5 DISTINCT documents of the same
    * source is boilerplate (nav bars, license footers) and is removed
    * from every document; d11 (first-occurrence segment dedup) keeps one
    * copy, this keeps none. Two shuffles: segment document-frequency per
    * (source, segment), then reassembly by doc — the frequency table is
    * the only state and shrinks with a HAVING in production. */
  val t29Boilerplate = q("t29_boilerplate_strip",
    """WITH tok AS (
      |  SELECT doc_id, source,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |seg AS (
      |  SELECT doc_id, source, i AS seg_idx,
      |         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS seg
      |  FROM (SELECT doc_id, source, t,
      |               unnest(generate_series(0, CAST(floor((len(t)-1)/10.0) AS INT))) AS i
      |        FROM tok WHERE len(t) > 0)),
      |freq AS (
      |  SELECT source, seg, count(DISTINCT doc_id) AS df
      |  FROM seg GROUP BY 1, 2),
      |flagged AS (
      |  SELECT s.doc_id, s.seg_idx, s.seg, f.df >= 5 AS boiler
      |  FROM seg s JOIN freq f ON s.source = f.source AND s.seg = f.seg)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_segs,
      |       CAST(count(CASE WHEN boiler THEN 1 END) AS BIGINT) AS n_boiler,
      |       coalesce(string_agg(CASE WHEN NOT boiler THEN seg END, ' '
      |                           ORDER BY seg_idx), '') AS clean_text
      |FROM flagged GROUP BY 1""".stripMargin) { (s, d) =>
    val toks = split(trim(col("text")), "\\s+")
    val segIdx = expr("sequence(0, int(floor((size(__t) - 1) / 10.0)))")
    val segs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), toks.as("__t"))
      .where(size(col("__t")) > 0)
      .select(col("doc_id"), col("source"), posexplode(
        transform(segIdx,
          i => array_join(slice(col("__t"), i * 10 + 1, lit(10)), " ")))
        .as(Seq("seg_idx", "seg")))
    val freq = segs.groupBy("source", "seg")
      .agg(countDistinct("doc_id").as("df"))
    segs.join(freq, Seq("source", "seg"))
      .withColumn("boiler", col("df") >= 5)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("boiler"), 1)).as("n_boiler"),
        concat_ws(" ", transform(
          sort_array(collect_list(
            when(!col("boiler"), struct(col("seg_idx"), col("seg"))))),
          kv => kv.getField("seg"))).as("clean_text"))
  }

  /** M7 — patch-hash image near-dup: tile every image into the m4 patch
    * grid, hash each tile, and score images by the fraction of their
    * tiles that also appear in ANOTHER image — catching collages, crops,
    * and re-encodes that exact whole-file dedup (m1's content hash)
    * misses. Tile hashing is scan-side; the only shuffle is the
    * per-patch-hash document frequency (bounded by the tile vocabulary). */
  val m7PatchDedup = q("m7_patch_dedup",
    """WITH img AS (SELECT doc_id, text FROM documents WHERE length(text) >= 128),
      |grid AS (SELECT doc_id, text, pr.r AS pr, pc.c AS pc
      |         FROM img CROSS JOIN range(0, 2) pr(r) CROSS JOIN range(0, 4) pc(c)),
      |patches AS (
      |  SELECT doc_id,
      |         md5(substr(text, CAST(pr*64 + 0*16 + pc*4 + 1 AS INT), 4) ||
      |             substr(text, CAST(pr*64 + 1*16 + pc*4 + 1 AS INT), 4) ||
      |             substr(text, CAST(pr*64 + 2*16 + pc*4 + 1 AS INT), 4) ||
      |             substr(text, CAST(pr*64 + 3*16 + pc*4 + 1 AS INT), 4)) AS patch_md5
      |  FROM grid),
      |freq AS (SELECT patch_md5, count(DISTINCT doc_id) AS df FROM patches GROUP BY 1)
      |SELECT p.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_patches,
      |       CAST(count(CASE WHEN f.df > 1 THEN 1 END) AS BIGINT) AS n_shared,
      |       CAST(count(CASE WHEN f.df > 1 THEN 1 END) AS DOUBLE) / count(*) AS shared_frac
      |FROM patches p JOIN freq f ON p.patch_md5 = f.patch_md5
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val rows = 4
    val rowW = 16
    val patch = 4
    val patches = Tables.documents(s, d)
      .where(length(col("text")) >= 128)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(1))).as("pr"))
      .select(col("doc_id"), col("text"), col("pr"),
        explode(sequence(lit(0), lit(3))).as("pc"))
      .select(col("doc_id"),
        md5(concat((0 until rows).map(r =>
          col("text").substr(col("pr") * 64 + r * rowW + col("pc") * patch + 1,
            lit(patch))): _*)).as("patch_md5"))
    val freq = patches.groupBy("patch_md5")
      .agg(countDistinct("doc_id").as("df"))
    patches.join(freq, Seq("patch_md5"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_patches"),
        count(when(col("df") > 1, 1)).as("n_shared"),
        (count(when(col("df") > 1, 1)).cast("double") / count(lit(1)))
          .as("shared_frac"))
  }

  /** D19 — incremental batch-vs-corpus dedup: the production shape where
    * a new ingest batch (here doc_id % 10 ∈ {8,9}) dedups against the
    * EXISTING corpus without recomputing it. Batch signatures join the
    * corpus's (band, bucket) table — at 100 TB the corpus side is
    * pre-materialized once and only the batch (orders of magnitude
    * smaller) is signed per run, so cost scales with the batch, not the
    * corpus. Candidates verify with exact 3-shingle Jaccard ≥ 0.5; a
    * batch doc is kept iff no corpus member verifies. */
  val d19IncrementalDedup = q("d19_incremental_dedup",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
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
      |  SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS corpus_id
      |  FROM sigs b JOIN sigs c ON b.band = c.band AND b.h = c.h
      |  WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8),
      |sets AS (SELECT doc_id, list_distinct(shingles) AS shset FROM sh),
      |ver AS (
      |  SELECT cand.new_id,
      |         """.stripMargin + rnd(
      """CAST(len(list_distinct(list_intersect(a.shset, b.shset))) AS DOUBLE)
      |           / (len(a.shset) + len(b.shset)
      |              - len(list_distinct(list_intersect(a.shset, b.shset))))""".stripMargin, 4) +
    """ AS j
      |  FROM cand
      |  JOIN sets a ON cand.new_id = a.doc_id
      |  JOIN sets b ON cand.corpus_id = b.doc_id),
      |scored AS (
      |  SELECT new_id, CAST(count(*) AS BIGINT) AS n_cand,
      |         CAST(count(CASE WHEN j >= 0.5 THEN 1 END) AS BIGINT) AS n_dup
      |  FROM ver GROUP BY 1)
      |SELECT d.doc_id, coalesce(s.n_cand, 0) AS n_cand,
      |       coalesce(s.n_dup, 0) AS n_dup,
      |       coalesce(s.n_dup, 0) = 0 AS kept
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
      |LEFT JOIN scored s ON d.doc_id = s.new_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val sigs = NearDup.withMinhashSignature(docs, "doc_id", col("text"), 3, 8)
    val banded = sigs.select(col("doc_id") +: NearDup.bandHashes(8, 8): _*)
      .select(col("doc_id"), explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("h"))): _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
      .localCheckpoint(true)
    val batchSide = banded.where(col("doc_id") % 10 >= 8)
      .withColumnRenamed("doc_id", "id_a")
    val corpusSide = banded.where(col("doc_id") % 10 < 8)
      .withColumnRenamed("doc_id", "id_b")
    val cand = batchSide.join(corpusSide, Seq("band", "h"))
      .select("id_a", "id_b").distinct()
    val ver = NearDup.jaccardOnPairs(docs, cand, "doc_id", col("text"), 3)
    val scored = ver.groupBy(col("id_a").as("doc_id"))
      .agg(count(lit(1)).as("c"),
        count(when(col("jaccard") >= 0.5, 1)).as("dup"))
    Tables.documents(s, d).where(col("doc_id") % 10 >= 8).select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("c"), lit(0L)).as("n_cand"),
        coalesce(col("dup"), lit(0L)).as("n_dup"),
        (coalesce(col("dup"), lit(0L)) === 0).as("kept"))
  }

  val all: Seq[Q] = Seq(p11PrioritySample, e35RunLength, sqlScalarSubquery,
    sqlLateralAgg, t29Boilerplate, m7PatchDedup, d19IncrementalDedup)
}
