package graft.sinks

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("violating drain is refused before anything is staged") {
    val base = tmp("cons_refuse")
    val staging = s"$base/staging"; val wh = s"$base/wh"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(staging)
    Constraints.drainChecked(spark, staging, wh, 1L, Seq("k_pos" -> "k > 0"))
    assert(AtomicWarehouse.currentVersion(spark, wh) == 1L)
    // epoch 2 carries a violation: k = -7
    Seq((3L, "c"), (-7L, "bad")).toDF("k", "v")
      .write.mode("overwrite").parquet(staging)
    val e = intercept[ConstraintViolationException] {
      Constraints.drainChecked(spark, staging, wh, 2L, Seq("k_pos" -> "k > 0"))
    }
    assert(e.getMessage.contains("k_pos=1"))
    // nothing moved: no new version, no epoch dir, staging NOT truncated
    assert(AtomicWarehouse.currentVersion(spark, wh) == 1L)
    assert(!new java.io.File(s"$wh/epoch_2").exists())
    assert(spark.read.parquet(staging).count() == 2)
    // fixing the batch lets the same drain proceed
    Seq((3L, "c"), (7L, "good")).toDF("k", "v")
      .write.mode("overwrite").parquet(staging)
    Constraints.drainChecked(spark, staging, wh, 2L, Seq("k_pos" -> "k > 0"))
    assert(AtomicWarehouse.currentVersion(spark, wh) == 2L)
    assert(AtomicWarehouse.read(spark, wh, "k").count() == 4)
  }

  test("UNKNOWN passes, FALSE violates (SQL CHECK semantics)") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y"), (-1L, "z"))
      .toDF("k", "v")
    val report = Constraints.violationReport(df, Seq("k_pos" -> "k > 0"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // null k => UNKNOWN => passes; only k = -1 violates
    assert(report == Map("k_pos" -> 1L))
  }

  test("constraint names are data, not SQL — hostile names round-trip") {
    val df = Seq((1L, "x"), (-1L, "y")).toDF("k", "v")
    val name = """k's "check" `with` everything, even commas"""
    val report = Constraints.violationReport(df,
        Seq(name -> "k > 0", name -> "k >= 0")) // duplicate name is fine too
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(report.length == 2 && report.forall(r => r._1 == name && r._2 == 1L))
  }

  test("check and drain see ONE snapshot: late staging files cannot slip past the gate") {
    val base = tmp("cons_snapshot")
    val staging = s"$base/staging"; val wh = s"$base/wh"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(staging)
    // a concurrent writer lands a VIOLATING file between the audit and
    // the commit (the afterCheck seam fires in exactly that window): the
    // drained epoch must be the checked snapshot — the late row neither
    // fails the (already-passed) check nor sneaks into the warehouse
    Constraints.drainChecked(spark, staging, wh, 1L,
      Seq("k_pos" -> "k > 0"),
      afterCheck = () =>
        Seq((-99L, "late")).toDF("k", "v")
          .write.mode("append").parquet(staging))
    val drained = AtomicWarehouse.read(spark, wh, "k")
      .select(col("k").cast("long"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(drained == Set((1L, "a"), (2L, "b")),
      s"drained epoch diverged from the checked snapshot: $drained")
    // the late row is gone with the truncate (K7 truncates the staging
    // DIRECTORY; the next epoch's writer re-stages everything current) —
    // what matters is it never reached the warehouse unchecked
    assert(spark.read.parquet(staging).count() == 0)
  }
}
