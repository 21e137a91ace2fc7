package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Operator coverage map (SURVEY.md §2 → query name):
  *  - S1/S8 dim scans → s1_dim_scan; S2/P4/W3 pushdown scan →
  *    s2_pushdown_scan; S5/S6/P1/P3 projection → s5_projection
  *  - J1 → j1_left_join_default; J2/J3 → j3_multihop_dim_join;
  *    J4/F18 → j4_conditional_lookup; J5/K4/J7/J8 → j5_upsert_merge;
  *    J6/U2 → j6_anti_join; P5 → p5_semi_membership
  *  - A1 → a1_grouped_metrics; A2/A3 → a2_minmax; A4 → a4_distinct
  *  - W1 → w1_keeplast_dedup; W2 → w2_window_dedup; W4 → w4_topk;
  *    U1 → u1_union_dedup; extra window → w5_running_window, a5_group_stats
  *  - F1–F7/P6 → f_titlecode; F9/F13 → f9_safe_cast; F10/F21/F22 →
  *    f10_tz_convert; F12 → f12_seconds_hms (custom codegen Expression);
  *    F11/F14–F17 → f15_derived_rates; F19/F20 → f19_sanitize_allstring
  *  - §2.9 streaming semantics (batch-deterministic form) → e1_window_agg,
  |    e2_sessionize; nested JSON flatten → e3_json_flatten
  *  - K1–K8 sinks → graft.sinks.Warehouse (+ pipeline tests)
  *  - North-star: dedup d1–d5, text t1–t4, vectors v1–v3, multimodal m1
  */
object SparkEntry {

  val allQueries: Seq[Q] =
    Relational.all ++ Scalars.all ++ TextQueries.all ++ VecQueries.all ++
      EventQueries.all ++ Extended.all ++ Analytics2.all ++ Training2.all ++
      Extended3.all ++ Extended4.all ++ Extended5.all ++ Extended6.all ++
      Extended7.all ++ Extended8.all ++ Extended9.all ++ Extended10.all ++
      Extended11.all ++ Extended12.all ++ Extended13.all ++ Extended14.all ++
      Extended15.all ++ Extended16.all ++ Extended17.all ++ Extended18.all ++
      Extended19.all ++ Extended20.all ++ Extended21.all ++ Extended22.all ++ Extended23.all ++ Extended24.all ++ Extended25.all ++ Extended26.all ++ Extended27.all ++ Extended28.all ++ Extended29.all ++ Extended30.all ++ Extended31.all ++ Extended32.all ++ Extended33.all ++ Extended34.all ++ Extended35.all ++ Extended36.all ++ Extended37.all ++ Extended38.all ++ Extended39.all ++ Extended40.all ++ Extended41.all ++ Extended42.all ++ Extended43.all ++ Extended44.all ++ Extended45.all ++ Extended46.all ++ Extended47.all ++ Extended48.all ++ Extended49.all ++ Extended50.all ++ Extended51.all ++ Extended52.all ++ Extended53.all ++ Extended54.all ++ Extended55.all ++ Extended56.all ++ Extended57.all ++ Extended58.all ++ Extended59.all ++ Extended60.all ++ Extended61.all ++ Extended62.all ++ Extended63.all ++ Extended64.all ++ Extended65.all ++ Extended66.all ++ Extended67.all ++ Extended68.all ++ Extended69.all ++ Extended76.all ++ Extended80.all ++ Extended85.all ++ Extended87.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. One epoch of
    * the reference pipeline re-shaped onto the star schema: pushdown scan →
    * broadcast dim joins → derived metrics → keep-last dedup → grouped
    * rollup. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val latest = ops.Dedup.keepFirstBy(li, Seq("l_orderkey"),
      Seq(col("l_linenumber").desc))
    latest.join(o, latest("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .groupBy(coalesce(n("n_name"), lit("unknown")).as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  /** One entry per implemented operator from SURVEY.md §2.
    * Insertion-ordered (NOT a hash map): battery consumers (Bench, the
    * driver) iterate this map, and hash-map order changes whenever the
    * query COUNT changes — which made per-query timings incomparable
    * across rounds (every round reshuffled which queries inherit a warm
    * vs pressured JVM). Declaration order is stable: existing queries
    * keep their slot, new ones append. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(allQueries.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
