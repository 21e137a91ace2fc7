package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 40: time-weighted aggregation — the irregular-
  * sampling average that plain avg() gets wrong.
  */
object Extended40 {

  /** E39 — time-weighted average (trapezoidal TWAP) of `value` per user
    * over purchase events: consecutive samples contribute
    * (vᵢ+vᵢ₊₁)/2 · Δtᵢ, normalized by the covered span — the standard
    * estimator when samples arrive irregularly (a plain average
    * over-weights bursts). One window (lead per user) + one aggregation;
    * single-purchase users have no span and drop out (both engines, by
    * the same null-lead filter). Cross-engine: the trapezoid products
    * carry float ulp noise that depends on summation order, so the
    * aggregate goes through the double-round (`rnd(rnd(·,8),6)`) that
    * absorbs last-ulp divergence (same discipline as the h-family
    * revenue sums).
    *
    * Scale: one keyed shuffle shared by the window and the aggregation;
    * per-user state is O(1) per row. */
  val e39Twap = q("e39_twap",
    s"""WITH p AS (
       |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS tus, value,
       |         lead(epoch_us(ts::TIMESTAMP)) OVER w AS nxt_t,
       |         lead(value) OVER w AS nxt_v
       |  FROM events WHERE event_type = 'purchase'
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC)),
       |seg AS (
       |  SELECT user_id, (value + nxt_v) / 2 * (nxt_t - tus) AS area,
       |         nxt_t - tus AS dt
       |  FROM p WHERE nxt_t IS NOT NULL)
       |SELECT user_id,
       |       CAST(count(*) AS BIGINT) AS n_segs,
       |       ${rnd(rnd("sum(area) / sum(dt)", 8), 6)} AS twap
       |FROM seg GROUP BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").asc, col("event_id").asc)
    Tables.events(s, d).where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("value"), col("event_id"))
      .withColumn("nxt_t", lead(col("tus"), 1).over(w))
      .withColumn("nxt_v", lead(col("value"), 1).over(w))
      .where(col("nxt_t").isNotNull)
      .select(col("user_id"),
        ((col("value") + col("nxt_v")) / 2 * (col("nxt_t") - col("tus"))).as("area"),
        (col("nxt_t") - col("tus")).as("dt"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_segs"),
        round(round(sum("area") / sum("dt"), 8), 6).as("twap"))
  }

  val all: Seq[Q] = Seq(e39Twap)
}
