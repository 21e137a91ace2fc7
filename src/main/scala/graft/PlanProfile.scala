package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway planning profiler vs an existing on-disk warehouse. */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    val wh = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sinks.AtomicWarehouse
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%.1f ms"); r
    }
    if (!new java.io.File(s"$wh/_graft_version").exists()) {
      println(s"building 1000-epoch warehouse at $wh")
      (1 to 1000).foreach { seq =>
        AtomicWarehouse.commitEpoch(spark, wh,
          spark.range(100).select(
            (col("id") + (seq - 1L) * 100).as("key"),
            lit(seq.toLong).as("load_seq")),
          seq.toLong, statsKey = Some("key"))
        if (seq % 200 == 0) println(s"  $seq")
      }
    }
    // warm JVM/fs once
    val v = AtomicWarehouse.currentVersion(spark, wh)
    val entries = timeIt("parse")(AtomicWarehouse.committedEntriesAt(spark, wh, v))
    println(s"entries: ${entries.size}")
    for (i <- 1 to 3) {
      timeIt(s"pruned plan #$i") {
        val df = spark.read.format("graft-warehouse").option("path", wh)
          .load().where(col("key").between(50000, 50099))
        df.queryExecution.executedPlan
      }
      timeIt(s"full plan #$i") {
        spark.read.format("graft-warehouse").option("path", wh)
          .load().queryExecution.executedPlan
      }
    }
    // break down: tombstone load, epochMayMatch sweep
    val dataEntries = entries.filterNot(e => AtomicWarehouse.isTombstone(e.name))
    for (i <- 1 to 2) {
      timeIt(s"loadTombstones #$i")(
        graft.sources.v2.WarehouseConnector.loadTombstones(spark, wh, entries))
      timeIt(s"epochMayMatch sweep #$i") {
        val f = org.apache.spark.sql.sources.And(
          org.apache.spark.sql.sources.GreaterThanOrEqual("key", 50000L),
          org.apache.spark.sql.sources.LessThanOrEqual("key", 50099L))
        dataEntries.count(e =>
          graft.sources.v2.WarehouseConnector.epochMayMatch(e, "key", f))
      }
    }
    spark.stop()
  }
}
