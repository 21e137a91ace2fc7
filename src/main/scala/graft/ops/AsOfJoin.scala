package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with the same key
  * and right.ts <= left.ts. Spark has no native operator; the naive
  * composition (theta-join on ts ranges + keep-max) explodes to
  * O(left × matching-right) rows.
  *
  * This is the scale-right shape: UNION both sides, one window sort per
  * key, `last(payload, ignoreNulls)` carries the most recent right
  * payload forward onto each left row. Cost = one shuffle on the key +
  * one per-key sort — linear in |left|+|right|, no intermediate blowup;
  * exactly how a 100 TB backfill should run. Right rows sort BEFORE left
  * rows at equal timestamps, so an exactly-simultaneous right row
  * matches (ASOF `>=` semantics, like DuckDB's ASOF JOIN).
  */
object AsOfJoin {

  /** @param left    probe side
    * @param right   reference side (must contain `key`, `ts`, `payload`)
    * @param key     equality key column name (same name both sides)
    * @param ts      event-time column name (same name both sides)
    * @param payload right-side columns carried onto left rows as
    *                `asof_<name>` (null = no right row at/before ts) */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val leftStructType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val r = right.select(col(key), col(ts), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"),
      lit(null).cast(leftStructType).as("__l"))
    val l = left.select(col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      struct(left.columns.map(col): _*).as("__l"))
    // tertiary __p sort: when several right rows share (key, ts) the
    // carried payload is otherwise partitioning-dependent; ordering by
    // the payload struct itself makes the survivor the MAX payload —
    // deterministic across runs and engines (left rows all have null __p,
    // which is a no-op among them)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * the same key and right.ts >= left.ts (pandas `merge_asof
    * direction='forward'`; DuckDB `ASOF ... ON l.ts <= r.ts`). Same
    * union-one-window shape as [[asOf]], with the traversal reversed:
    * sorting ts DESC and carrying the last right payload seen yields the
    * nearest FOLLOWING right row. Right rows order before left rows at
    * equal ts, so an exactly-simultaneous right row matches (`>=`).
    * Cost is identical to the backward join — one keyed shuffle + one
    * per-key sort, no range-blowup. Apply a match-window tolerance by
    * carrying the right ts in `payload` and null-gating downstream. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val leftStructType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val r = right.select(col(key), col(ts), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__p"),
      lit(null).cast(leftStructType).as("__l"))
    val l = left.select(col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(r.schema("__p").dataType).as("__p"),
      struct(left.columns.map(col): _*).as("__l"))
    // tertiary __p sort, same reason as the backward join: among equal-ts
    // right rows `last` carries whichever sorts LAST, so __p ASC makes the
    // MAX payload the deterministic survivor here too
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }
}
