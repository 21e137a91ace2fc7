package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 30: L28-style activity bitmaps and the
  * distributed weighted median.
  */
object Extended30 {

  /** E37 — L28 activity bitmap: each user's event days packed into one
    * 28-bit integer (bit k = active on day k of the window), the compact
    * engagement encoding product analytics keeps per user-month. The
    * bitmap is sum(DISTINCT 1<<day) — exact integer math, and popcount
    * gives active days for free. One aggregation; at 100 TB the bitmap
    * column replaces a 28× larger daily-activity fact. */
  val e37ActivityBitmap = q("e37_activity_bitmap",
    """WITH base AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      |days AS (
      |  SELECT user_id,
      |         CAST(CAST(ts AS DATE) - (SELECT d0 FROM base) AS BIGINT) AS day_off
      |  FROM events),
      |bm AS (
      |  SELECT user_id,
      |         CAST(sum(DISTINCT CASE WHEN day_off < 28 THEN 1 << day_off END) AS BIGINT) AS bitmap
      |  FROM days WHERE day_off < 28
      |  GROUP BY 1)
      |SELECT user_id, bitmap,
      |       CAST(bit_count(bitmap) AS INT) AS active_days,
      |       bit_count(bitmap & 127) > 0 AS active_week1,
      |       bit_count(bitmap & CAST(127 << 21 AS BIGINT)) > 0 AS active_week4
      |FROM bm""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val d0 = ev.agg(min(col("ts").cast("date")).as("d0"))
    ev.select(col("user_id"), col("ts").cast("date").as("day"))
      .crossJoin(broadcast(d0))
      .select(col("user_id"), datediff(col("day"), col("d0")).cast("long").as("day_off"))
      .where(col("day_off") < 28)
      .groupBy("user_id")
      .agg(sum_distinct(expr("shiftleft(cast(1 as bigint), cast(day_off as int))"))
        .cast("long").as("bitmap"))
      .select(col("user_id"), col("bitmap"),
        bit_count(col("bitmap")).cast("int").as("active_days"),
        (bit_count(col("bitmap").bitwiseAND(lit(127L))) > 0).as("active_week1"),
        (bit_count(col("bitmap").bitwiseAND(lit(127L << 21))) > 0).as("active_week4"))
  }

  /** W15 — distributed weighted median: per return flag, the
    * l_extendedprice at which cumulative l_quantity first reaches half
    * the group's total — the robust price-level statistic (a plain
    * median ignores that a 50-unit line should weigh 50× a 1-unit one).
    * Shape: one shuffle on the group key shared by the cumulative-sum
    * window and the total; the winner is the min qualifying price —
    * partial-aggregable, no second sort. Ties in the order key are
    * broken by (orderkey, linenumber), making the survivor exact. */
  val w15WeightedMedian = q("w15_weighted_median",
    """WITH cum AS (
      |  SELECT l_returnflag, l_extendedprice, l_quantity,
      |         sum(l_quantity) OVER (PARTITION BY l_returnflag
      |                               ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cw,
      |         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      |  FROM lineitem)
      |SELECT l_returnflag,
      |       min(l_extendedprice) AS weighted_median,
      |       CAST(max(tw) AS DOUBLE) AS total_weight
      |FROM cum WHERE cw * 2 >= tw
      |GROUP BY 1""".stripMargin) { (s, d) =>
    val wc = Window.partitionBy("l_returnflag")
      .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    val wt = Window.partitionBy("l_returnflag")
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("cw", sum("l_quantity").over(wc))
      .withColumn("tw", sum("l_quantity").over(wt))
      .where(col("cw") * 2 >= col("tw"))
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("weighted_median"),
        max("tw").cast("double").as("total_weight"))
  }

  val all: Seq[Q] = Seq(e37ActivityBitmap, w15WeightedMedian)
}
