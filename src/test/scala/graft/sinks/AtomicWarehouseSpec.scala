package graft.sinks

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AtomicWarehouseSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def snapshot(dir: String): Set[(Long, String, Long)] =
    AtomicWarehouse.read(spark, dir, "k")
      .select(col("k").cast("long"), col("v"), col("load_seq"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("two-epoch drain: last-wins merge, staging truncated") {
    val base = tmp("aw_basic")
    val staging = s"$base/staging"; val wh = s"$base/wh"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(staging)
    AtomicWarehouse.drain(spark, staging, wh, 1L)
    assert(spark.read.parquet(staging).count() == 0) // K7 ran
    Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(staging)
    AtomicWarehouse.drain(spark, staging, wh, 2L)
    assert(snapshot(wh) ==
      Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L)))
    assert(AtomicWarehouse.currentVersion(spark, wh) == 2L)
  }

  test("crash between data write and manifest commit: invisible, recoverable") {
    val base = tmp("aw_crash1")
    val staging = s"$base/staging"; val wh = s"$base/wh"
    Seq((1L, "a")).toDF("k", "v").write.parquet(staging)
    AtomicWarehouse.drain(spark, staging, wh, 1L)
    // simulate the crash: epoch-2 data lands but the manifest rename never
    // happens (write the dir directly, bypassing commitEpoch)
    Seq((1L, "a2"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(staging)
    Warehouse.allString(spark.read.parquet(staging))
      .withColumn("load_seq", lit(2L))
      .write.mode("overwrite").parquet(s"$wh/epoch_2")
    // readers see ONLY epoch 1 — never a half-appended epoch 2
    assert(snapshot(wh) == Set((1L, "a", 1L)))
    // recovery = run the same drain again: converges and commits
    AtomicWarehouse.drain(spark, staging, wh, 2L)
    assert(snapshot(wh) == Set((1L, "a2", 2L), (2L, "b", 2L)))
  }

  test("crash between manifest commit and truncate: replay is a no-op merge") {
    val base = tmp("aw_crash2")
    val staging = s"$base/staging"; val wh = s"$base/wh"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(staging)
    // simulate: commit succeeded, truncate never ran
    AtomicWarehouse.commitEpoch(spark, wh,
      Warehouse.allString(spark.read.parquet(staging))
        .withColumn("load_seq", lit(1L)), 1L)
    assert(spark.read.parquet(staging).count() == 2) // staging still full
    val before = snapshot(wh)
    // recovery = run the same drain again: epoch replay no-ops (immutable
    // committed epoch), only the truncate re-runs
    AtomicWarehouse.drain(spark, staging, wh, 1L)
    assert(snapshot(wh) == before)
    assert(AtomicWarehouse.currentVersion(spark, wh) == 1L) // no new version
    assert(spark.read.parquet(staging).count() == 0)
  }

  test("time travel: every historical version stays readable as-of") {
    val base = tmp("aw_tt")
    val staging = s"$base/staging"; val wh = s"$base/wh"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(staging)
    AtomicWarehouse.drain(spark, staging, wh, 1L)
    Seq((2L, "b2")).toDF("k", "v").write.mode("overwrite").parquet(staging)
    AtomicWarehouse.drain(spark, staging, wh, 2L)
    def snapAt(v: Long) = AtomicWarehouse.readVersion(spark, wh, "k", v)
      .select(col("k").cast("long"), col("v"), col("load_seq"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(snapAt(1L) == Set((1L, "a", 1L), (2L, "b", 1L)))
    assert(snapAt(2L) == Set((1L, "a", 1L), (2L, "b2", 2L)))
    assert(snapAt(2L) == snapshot(wh)) // current == latest version
  }

  test("committed epochs are immutable under empty-staging replay") {
    val base = tmp("aw_replay")
    val staging = s"$base/staging"; val wh = s"$base/wh"
    Seq((1L, "a")).toDF("k", "v").write.parquet(staging)
    AtomicWarehouse.drain(spark, staging, wh, 1L)
    // staging is now empty; a buggy scheduler re-fires the same epoch
    AtomicWarehouse.drain(spark, staging, wh, 1L)
    assert(snapshot(wh) == Set((1L, "a", 1L))) // data survived
  }
}
