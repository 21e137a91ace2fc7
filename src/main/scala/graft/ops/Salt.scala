package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — for keys whose row counts dwarf the rest
  * (a viral video's analytics rows, one mega-channel's uploads), a plain
  * groupBy/join puts the whole key on one task. Salting splits it.
  *
  * AQE's skewedJoin handles sort-merge-join skew at runtime; salting
  * covers the cases AQE can't: skewed AGGREGATION and broadcast-ineligible
  * skewed joins with deterministic partitioning needs.
  */
object Salt {

  /** Two-phase skew-safe aggregation: groupBy(key, salt) partial
    * aggregates (splits the hot key across `buckets` tasks), then
    * groupBy(key) combines the partials. `partials` must be
    * re-aggregable (sum/count/min/max — give avg as sum+count). */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
      partials: Seq[(String, Column => Column)], combine: String => Column): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(buckets)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._2(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (c, f) => f(col(c)).as(c) }: _*)
    phase1.groupBy(col(key))
      .agg(combine(partials.head._1).as(partials.head._1),
        partials.tail.map { case (c, _) => combine(c).as(c) }: _*)
  }

  /** Skew-safe inner equi-join: replicate the SMALL side `buckets` times
    * (one copy per salt) and salt the big side's key, so one hot key
    * spreads over `buckets` tasks. Use when the small side is too big to
    * broadcast but the big side is skewed. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(buckets)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
