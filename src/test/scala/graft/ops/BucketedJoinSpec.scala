package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Scale claim check: pre-bucketing both join sides on the key makes the
  * join shuffle-free (the "repeated epochs over bucketed staging" path —
  * at 100 TB this is the difference between an epoch that reshuffles the
  * fact table and one that doesn't). */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed-by-key tables join without a shuffle Exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    // force a join strategy that would otherwise shuffle — the point is
    // that bucketing satisfies the distribution requirement instead
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val d = "/root/testdata/sf0.001"
    graft.Tables.orders(spark, d)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum("l_quantity").as("qty"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(joined.count() > 0)

    // contrast: the same join over plain parquet DOES shuffle (or
    // broadcasts) — bucketing is what removed the Exchange
    val unbucketed = graft.Tables.orders(spark, d).join(
      graft.Tables.lineitem(spark, d)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum("l_quantity").as("qty")),
      Seq("o_orderkey"))
    val plan2 = unbucketed.queryExecution.executedPlan.toString
    assert(plan2.contains("Exchange") || plan2.contains("Broadcast"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
