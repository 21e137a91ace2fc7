package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 44: sequential-scan analytics (CUSUM), dense
  * linear algebra (patch projection), and probabilistic curation
  * (weighted thinning) — all hash-for-RNG deterministic.
  */
object Extended44 {

  /** E42 — CUSUM change-point detection (Page '54) on per-type daily
    * event counts: Sᵢ = max(0, Sᵢ₋₁ + (cᵢ − ref − slack)) with an alarm
    * when S crosses 5·ref. The recursion's max-reset makes it
    * inexpressible as a window frame — it's a FOLD, computed array-local
    * per type (sorted collect → aggregate HOF in Spark, list_reduce in
    * the oracle) with an all-integer accumulator [S, maxS, nAlarms,
    * firstAlarmDay], so the fold is exact in both engines. ref and slack
    * derive from the series itself (integer div), keeping the detector
    * scale-free. first_alarm_day is the 1-BASED ordinal into the sorted
    * daily series on both engines — Spark's `transform` lambda index is
    * 0-based, DuckDB's `list_transform` index is 1-based, so the Spark
    * side adds 1 explicitly (a divergence only visible when an alarm
    * fires at all: larger SFs have proportionally smaller daily noise and
    * may never alarm, which is why this needs a small-SF sweep to catch).
    *
    * Shape at scale: one groupBy to day granularity (map-side combined),
    * one to type; the fold is per-type array-local — state per type is
    * days-sized (bounded by calendar, not corpus). */
  val e42Cusum = q("e42_cusum_changepoint",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts::TIMESTAMP AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |ser AS (
      |  SELECT event_type,
      |         list_transform(
      |           list_sort(list(struct_pack(d := day, c := c))),
      |           r -> r.c) AS cs,
      |         CAST(count(*) AS BIGINT) AS ndays,
      |         CAST(sum(c) AS BIGINT) AS total
      |  FROM daily GROUP BY 1),
      |prm AS (
      |  SELECT event_type, cs, ndays, total // ndays AS ref,
      |         (total // ndays) // 10 AS slack
      |  FROM ser),
      |folded AS (
      |  SELECT event_type, ndays, ref,
      |         list_reduce(
      |           list_prepend([CAST(0 AS BIGINT), 0, 0, 0],
      |             list_transform(cs, (x, i) -> [x, CAST(i AS BIGINT), 0, 0])),
      |           (acc, e) -> [
      |             greatest(acc[1] + e[1] - ref - slack, 0),
      |             greatest(acc[2], greatest(acc[1] + e[1] - ref - slack, 0)),
      |             acc[3] + CASE WHEN greatest(acc[1] + e[1] - ref - slack, 0) > 5 * ref THEN 1 ELSE 0 END,
      |             CASE WHEN acc[3] = 0 AND greatest(acc[1] + e[1] - ref - slack, 0) > 5 * ref
      |                  THEN e[2] ELSE acc[4] END]) AS f
      |  FROM prm)
      |SELECT event_type, ndays, ref,
      |       f[2] AS max_cusum, f[3] AS n_alarms, f[4] AS first_alarm_day
      |FROM folded""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy("event_type")
      .agg(expr("transform(array_sort(collect_list(struct(day, c))), r -> r.c)").as("cs"),
        count(lit(1)).as("ndays"), sum("c").as("total"))
      .select(col("event_type"), col("cs"), col("ndays"),
        expr("total div ndays").as("ref"),
        expr("(total div ndays) div 10").as("slack"))
      .withColumn("f", expr(
        """aggregate(
          |  transform(cs, (x, i) -> array(x, CAST(i AS BIGINT) + 1L, 0L, 0L)),
          |  array(0L, 0L, 0L, 0L),
          |  (acc, e) -> array(
          |    greatest(acc[0] + e[0] - ref - slack, 0L),
          |    greatest(acc[1], greatest(acc[0] + e[0] - ref - slack, 0L)),
          |    acc[2] + CASE WHEN greatest(acc[0] + e[0] - ref - slack, 0L) > 5 * ref THEN 1L ELSE 0L END,
          |    CASE WHEN acc[2] = 0L AND greatest(acc[0] + e[0] - ref - slack, 0L) > 5 * ref
          |         THEN e[1] ELSE acc[3] END))""".stripMargin))
      .select(col("event_type"), col("ndays"), col("ref"),
        col("f").getItem(1).as("max_cusum"),
        col("f").getItem(2).as("n_alarms"),
        col("f").getItem(3).as("first_alarm_day"))
  }

  /** M14 — patch embedding projection (the ViT patchify→linear step,
    * Dosovitskiy et al. ICLR'21): each 64-dim embedding splits into 4
    * patches of 16, and every patch projects through a shared 4×16
    * weight matrix (deterministic integer weights — a trained matrix
    * would broadcast identically) to a 4-dim output. The inner products
    * run as FIXED-ORDER left folds over the 16 dims in both engines, so
    * the float sums are bit-identical; the double-round absorbs nothing
    * but guards the contract. This is the dense-matmul operator class
    * (distinct from m4's reshape-only patchify).
    *
    * Shape at scale: pure scan-side projection — zero shuffles before
    * the final explode to (vector, patch) rows; weights are a compile-
    * time constant (broadcast-equivalent). */
  val m14PatchProject = q("m14_patch_project", {
    // deterministic weight: w(o,i) = md5-int('pw:o:i') % 21 - 10
    def w(o: Int, i: Int) =
      s"(('0x' || substr(md5('pw:$o:$i'), 1, 8))::BIGINT % 21 - 10)"
    val outs = (0 until 4).map { o =>
      val terms = (0 until 16).map(i =>
        s"CAST(embedding[CAST(p * 16 + ${i + 1} AS INT)] AS DOUBLE) * ${w(o, i)}")
      // left-to-right parenthesized sum = fixed fold order
      s"${rnd(rnd(terms.reduce((a, b) => s"($a) + ($b)"), 8), 6)} AS o$o"
    }.mkString(",\n       ")
    s"""SELECT vec_id, CAST(p AS INT) AS patch,
       |       $outs
       |FROM embeddings CROSS JOIN range(0, 4) r(p)""".stripMargin
  }) { (s, d) =>
    def wS(o: Int, i: Int) =
      s"(CAST(conv(substring(md5('pw:$o:$i'), 1, 8), 16, 10) AS BIGINT) % 21 - 10)"
    val outs = (0 until 4).map { o =>
      val terms = (0 until 16).map(i =>
        s"CAST(element_at(embedding, p * 16 + ${i + 1}) AS DOUBLE) * ${wS(o, i)}")
      round(round(expr(terms.reduce((a, b) => s"($a) + ($b)")), 8), 6).as(s"o$o")
    }
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(3))).as("p"))
      .select(Seq(col("vec_id"), col("p").as("patch")) ++ outs: _*)
  }

  /** P14 — weighted Bernoulli thinning (score-proportional downsampling,
    * the FineWeb per-document acceptance pattern): document d survives
    * iff hash-uniform(d) < p(d), with p proportional to capped length
    * (the stand-in for a quality score). The comparison is cross-
    * multiplied into pure integers — u·2000 < min(n_chars,2000)·2³² —
    * so acceptance is exact in both engines; the audit output pins the
    * realized per-source rates against the expected ones.
    *
    * Shape at scale: the accept test is scan-side (no shuffle, composes
    * with pushdown); the audit agg is source-cardinality sized. */
  val p14WeightedThinning = q("p14_weighted_thinning",
    """WITH t AS (
      |  SELECT doc_id, source, n_chars,
      |         ('0x' || substr(md5('u:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u,
      |         least(n_chars, 2000) AS cap
      |  FROM documents)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN u * 2000 < cap * 4294967296 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
      |       CAST(sum(cap) AS BIGINT) AS exp_scaled
      |FROM t GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        conv(substring(md5(concat(lit("u:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").as("u"),
        least(col("n_chars"), lit(2000L)).as("cap"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("u") * 2000 < col("cap") * 4294967296L, 1L).otherwise(0L)).as("kept"),
        sum("cap").as("exp_scaled"))
  }

  val all: Seq[Q] = Seq(e42Cusum, m14PatchProject, p14WeightedThinning)
}
