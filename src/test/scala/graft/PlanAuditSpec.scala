package graft

/** Machine-checked physical-plan quality audits: the properties that keep
  * each operator viable at 100 TB — filters reaching the parquet scan,
  * dimension joins broadcast (not shuffled), interval joins never planned
  * as nested loops, top-k as TakeOrderedAndProject (no global sort),
  * unpivot as Expand (zero shuffle), aggregation with a map-side partial
  * phase, and the minhash pipeline paying exactly one shuffle.
  *
  * Assertions run on the pre-AQE static plan (`queryExecution.sparkPlan`)
  * — the plan Catalyst commits to from statistics alone; AQE can only
  * improve on it at runtime.
  */
class PlanAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("s2: predicates and projection reach the parquet scan") {
    val p = plan("s2_pushdown_scan")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), "no filters pushed:\n" + p)
    // projection pruned: the scan must not read the full lineitem schema
    assert(!p.contains("l_comment") && !p.contains("l_tax"),
      "scan reads columns the query never touches:\n" + p)
  }

  test("dimension joins broadcast; no shuffled join on a dim table") {
    for (q <- Seq("j1_left_join_default", "j3_multihop_dim_join",
        "j4_conditional_lookup")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q shuffle-joins a dim:\n$p")
    }
  }

  test("anti/semi membership joins broadcast") {
    assert(plan("j6_anti_join").contains("BroadcastHashJoin"))
    assert(plan("p5_semi_membership").contains("BroadcastHashJoin"))
  }

  test("binned range join never degrades to a nested loop") {
    val p = plan("e7_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("as-of join never degrades to a nested loop") {
    val p = plan("e5_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("w4_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("unpivot is pure Expand — zero shuffles") {
    val p = plan("e8_unpivot")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Exchange"), "unpivot shuffles:\n" + p)
  }

  test("grouped aggregate has a map-side partial phase") {
    val p = plan("a1_grouped_metrics")
    assert(count(p, "HashAggregate") >= 2,
      "no partial aggregation (map-side combine missing):\n" + p)
  }

  test("minhash signature pipeline pays exactly one shuffle") {
    val p = plan("d2_minhash_signature")
    // one round-robin/hash repartition before the explode; the groupBy
    // reuses that partitioning — a second Exchange means the reuse broke
    assert(count(p, "Exchange") == 1,
      s"expected exactly 1 shuffle, got ${count(p, "Exchange")}:\n$p")
  }

  test("codegen dot product is in the similarity plans") {
    assert(plan("v1_cosine_topk").contains("vec_dot"))
    assert(plan("v5_int8_quantize").contains("FLOOR"))
  }

  test("flagship entry broadcasts its dims") {
    val p = SparkEntry.entry(spark).queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
