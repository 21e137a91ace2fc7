package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class NearDupSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog")    // exact dup of 1
  ).toDF("doc_id", "text")

  test("shingles: n consecutive tokens; short docs collapse to one") {
    val sh = docs.select(NearDup.shingles(col("text"), 3).as("s"))
      .where(col("doc_id").isNull || lit(true)).collect()
    val first = docs.where(col("doc_id") === 1)
      .select(NearDup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(first.head == "the quick brown" && first.size == 7)
    val short = Seq((9L, "one two")).toDF("doc_id", "text")
      .select(NearDup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(short == Seq("one two"))
  }

  test("minhash signatures: identical docs share all, near-dups most") {
    val sigs = NearDup.withMinhashSignature(docs, "doc_id", col("text"), 3, 8)
      .collect().map(r => r.getLong(0) ->
        (0 until 8).map(i => r.getString(r.fieldIndex(s"sig$i")))).toMap
    assert(sigs(1L) == sigs(4L)) // exact dup: identical signature
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree12 > agree13) // near-dup agrees more than unrelated
  }

  test("LSH candidates find the planted dup pair") {
    val pairs = NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
  }

  test("exact jaccard: 1.0 for identical, (0,1) for near-dup") {
    val cands = NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
    val j = NearDup.jaccardOnPairs(docs, cands, "doc_id", col("text"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 4L)) == 1.0)
    j.get((1L, 2L)).foreach(v => assert(v > 0 && v < 1))
  }

  test("hot-bucket cap bounds adversarial candidate volume deterministically") {
    // 40 identical docs: one degenerate bucket per band, uncapped pairs =
    // C(40,2) = 780 × full band agreement
    val hot = (0L until 40L).map(i => (i, "same text repeated in every doc here"))
      .toDF("doc_id", "text")
    val uncapped = NearDup.lshCandidates(hot, "doc_id", col("text"), 3, 8, 8)
    assert(uncapped.count() == 780)
    val capped = NearDup.lshCandidates(hot, "doc_id", col("text"), 3, 8, 8,
      maxBucket = 5)
    // per band at most C(5,2)=10 pairs; 8 bands sample different 5-subsets
    // so the distinct-pair union is ≤ 80 — quadratic in the CAP, not the
    // bucket
    val n = capped.count()
    assert(n <= 80 && n >= 10, s"capped pair count $n outside [10, 80]")
    // deterministic: same selection on re-run
    assert(capped.collect().toSet ==
      NearDup.lshCandidates(hot, "doc_id", col("text"), 3, 8, 8, 5).collect().toSet)
    // non-colliding docs are untouched by the cap
    val mixed = hot.unionByName(docs.where(col("doc_id").isin(1L, 4L))
      .withColumn("doc_id", col("doc_id") + 1000L))
    val cm = NearDup.lshCandidates(mixed, "doc_id", col("text"), 3, 8, 8, 5)
      .where(col("id_a") >= 1000L).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cm.contains((1001L, 1004L)))
  }

  test("simhash: equal for identical docs, closer for near-dups") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val toks = docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tk"))
    val h = NearDup.simhash16(toks, "doc_id", "tk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(4L))
    assert(ham(h(1L), h(2L)) <= ham(h(1L), h(3L)))
  }
}
