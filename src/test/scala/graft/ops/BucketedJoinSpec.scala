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

  test("c9 battery entry reuses fixed tables: metastore and disk stay flat across runs") {
    val d = "/root/testdata/sf0.01" // sf0.001 has no urgent %97 orders at all
    def c9Tables() = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_c9")).collect().map(_.name).sorted.toSeq
    def diskEntries() = {
      val base = new java.io.File(sys.props("java.io.tmpdir") + "/graft_c9_tables")
      if (!base.exists()) Seq.empty
      else base.listFiles().map(_.getName).sorted.toSeq
    }
    val q = graft.SparkEntry.queries("c9_bucketed_join")
    val first = q(spark, d).collect().length
    val (tabs1, disk1) = (c9Tables(), diskEntries())
    val second = q(spark, d).collect().length
    val (tabs2, disk2) = (c9Tables(), diskEntries())
    assert(first == second && first > 0)
    assert(tabs1 == Seq("graft_c9_l", "graft_c9_o"),
      s"expected exactly the two fixed tables, got $tabs1")
    assert(tabs2 == tabs1, s"metastore grew across runs: $tabs1 -> $tabs2")
    assert(disk1 == disk2 && disk1.toSet == Set("l", "o"),
      s"temp dir grew across runs: $disk1 -> $disk2")
  }
}
