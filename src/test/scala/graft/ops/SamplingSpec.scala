package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def bottomK(ids: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    val ds = ids.toDF("id")
      .repartition(parts)
      .select(md5(col("id").cast("string")), col("id"))
      .as[(String, Long)]
    ds.groupByKey(_ => 0)
      .agg(Sampling.BottomK(k).toColumn.name("s"))
      .collect().head._2
  }

  test("bottom-k equals the sort-based definition") {
    val ids = (1L to 100L)
    // reference: k smallest md5 priorities, computed independently
    val byHash = ids.map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString -> i
    }.sortBy(_._1).map(_._2).take(7).toList
    assert(bottomK(ids, 7, parts = 1) == byHash)
  }

  test("partitioning-independent: same sample under any parallelism") {
    val ids = (1L to 500L)
    val one = bottomK(ids, 11, parts = 1)
    assert(bottomK(ids, 11, parts = 7) == one)
    assert(bottomK(ids, 11, parts = 32) == one)
  }

  test("k larger than the group returns everything, sorted by priority") {
    val got = bottomK(Seq(1L, 2L, 3L), 10, parts = 2)
    assert(got.toSet == Set(1L, 2L, 3L) && got.length == 3)
  }

  test("map-side combine: the plan keeps a partial aggregation phase") {
    val ds = (1L to 50L).toDF("id")
      .select(md5(col("id").cast("string")), col("id")).as[(String, Long)]
    val plan = ds.groupByKey(_ => 0)
      .agg(Sampling.BottomK(3).toColumn.name("s"))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("partial_bottomk") || plan.toLowerCase.contains("partial"),
      "no partial aggregation phase:\n" + plan)
  }
}
