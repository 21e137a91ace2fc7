package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** W1 keep-last dedup + J5 upsert-merge semantics and invariants. */
class DedupMergeSpec extends SparkSuite {
  import spark.implicits._

  private val base = Seq(
    ("v1", "old-title", 1L), ("v2", "old-2", 2L), ("v1", "new-title", 5L)
  ).toDF("id", "title", "seq")

  test("keep-last picks the greatest sequence per key") {
    val got = Dedup.keepLast(base, "id", col("seq"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("v1" -> "new-title", "v2" -> "old-2"))
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = Dedup.keepLast(base, "id", col("seq"))
    val twice = Dedup.keepLast(once, "id", col("seq"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("union+dedup commutes with batch splitting") {
    val b1 = base.where(col("seq") <= 2)
    val b2 = base.where(col("seq") > 2)
    val split = Dedup.keepLast(b1.unionByName(b2), "id", col("seq"))
    val whole = Dedup.keepLast(base, "id", col("seq"))
    assert(split.collect().toSet == whole.collect().toSet)
  }

  test("upsert-merge: updates win where present, base survives elsewhere") {
    val b = Seq(("k1", 10, "x"), ("k2", 20, "y")).toDF("k", "v", "tag")
    val u = Seq(("k1", 99), ("k3", 7)).toDF("k", "v")
    val got = Merge.upsertColumns(b, u, "k")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    // k3 is dropped (update without a base row), k1 overwritten, k2 kept
    assert(got == Set(("k1", 99, "x"), ("k2", 20, "y")))
  }

  test("upsert-merge appends update-only columns") {
    val b = Seq(("k1", 1)).toDF("k", "v")
    val u = Seq(("k1", "extra")).toDF("k", "note")
    val row = Merge.upsertColumns(b, u, "k").collect().head
    assert(row.getString(row.fieldIndex("note")) == "extra")
  }
}
