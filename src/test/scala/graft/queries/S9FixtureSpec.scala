package graft.queries

import graft.SparkSuite

/** The s9 fixture must be built executor-side (`df.write.json` part
  * files), exactly once per sf dir — its earlier form collected O(corpus)
  * rows to the driver on EVERY execution (warmup + timed), the one
  * corpus-growing `.collect()` in the battery and a 10× driver-tail
  * regression in round 4. */
class S9FixtureSpec extends SparkSuite {

  test("fixture builds once per sf dir, as JSONL part files, and s9 stays correct") {
    val d = "/root/testdata/sf0.001"
    Extended36.fixtureCache.clear()
    val q = graft.SparkEntry.queries("s9_dsv2_topn")

    val first = q(spark, d).collect()
    assert(Extended36.fixtureCache.size == 1)
    val dir = new java.io.File(Extended36.fixtureCache.values.iterator.next())
    assert(dir.isDirectory, "fixture must be a df.write.json directory")
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty, "expected JSONL part files")

    // second execution (the timed run after warmup) must NOT rebuild
    val before = parts.map(f => f.getName -> f.lastModified()).toMap
    val second = q(spark, d).collect()
    val after = dir.listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "fixture was rebuilt on the second run")

    // a FRESH JVM (simulated by clearing the in-memory memo) must adopt
    // the complete on-disk fixture instead of rebuilding — the fixed path
    // + _SUCCESS gate is what stops per-JVM dirs accumulating in tmpdir
    Extended36.fixtureCache.clear()
    q(spark, d).collect()
    val afterClear = dir.listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(afterClear == before, "fixture was rebuilt by a fresh JVM")

    // correctness: top-25 by published_at desc within channel ch3
    assert(first.length == second.length && first.length <= 25 && first.nonEmpty)
    val pubs = first.map(_.getString(first.head.fieldIndex("published_at")))
    assert(pubs.sameElements(pubs.sorted(Ordering[String].reverse)),
      "results must be published_at-descending")
    assert(first.forall(_.getString(first.head.fieldIndex("channel_id")) == "ch3"))
  }
}
