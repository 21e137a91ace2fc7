package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Planted-fixture semantics for the round-2 Extended9 operators — the
  * properties the DuckDB-oracle hash can't articulate (it proves
  * agreement, not intent).
  */
class Extended9Spec extends SparkSuite {
  import spark.implicits._

  private def docsFrom(rows: Seq[(Long, String)], source: String = "web") = {
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit(source))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("e9docs").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d11: a boilerplate segment survives only in its first document") {
    val boiler = (1 to 10).map(i => s"nav$i").mkString(" ") // exactly one 10-token segment
    val unique = (1 to 10).map(i => s"own$i").mkString(" ")
    val dir = docsFrom(Seq(
      1L -> s"$boiler $unique",
      2L -> s"$boiler ${unique.replace("own", "two")}"))
    val out = Extended9.d11SegmentDedup.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 2, "doc 1 keeps both its segments")
    assert(out(2L).getLong(2) == 1, "doc 2 loses the boilerplate segment")
    assert(out(1L).getString(3) == s"$boiler $unique")
    assert(out(2L).getString(3) == unique.replace("own", "two"),
      "reassembly preserves intra-doc segment order after the drop")
  }

  test("d11: dedup is keep-first in (doc_id, seg_idx) order, not arbitrary") {
    val seg = (1 to 10).map(i => s"w$i").mkString(" ")
    val dir = docsFrom(Seq(5L -> seg, 3L -> seg))
    val out = Extended9.d11SegmentDedup.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(3L) == 1 && out(5L) == 0, "lowest doc_id wins, not file order")
  }

  test("t21: temperature T=2 up-weights tail sources vs proportional share") {
    // head: 160 docs, tail: 10 docs → proportional head share 94%;
    // sqrt weights: sqrt(160):sqrt(10) ≈ 4:1 → head share 80%
    val rows = (1L to 160L).map(i => i -> s"head doc $i") ++
      (161L to 170L).map(i => i -> s"tail doc $i")
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", when(col("doc_id") <= 160, "head").otherwise("tail"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("e9mix").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val quotas = Extended9.t21MixWeights.fn(spark, dir)
      .groupBy("source").agg(max("quota").as("q"), count(lit(1)).as("picked"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (headQ, headPicked) = quotas("head")
    val (tailQ, tailPicked) = quotas("tail")
    assert(headQ + tailQ <= 300, "integer quotas never exceed the budget")
    assert(tailQ.toDouble / (headQ + tailQ) > 10.0 / 170.0,
      s"tail share must beat its proportional share, got $tailQ/$headQ")
    assert(headPicked == math.min(headQ, 160) && tailPicked == math.min(tailQ, 10),
      "each source fills its quota up to its population")
  }

  test("t21: picks are deterministic under input partitioning") {
    // same corpus written as 1 file vs 7 files — the hash-ranked sample
    // must be identical (the property rand()/TABLESAMPLE never give)
    val rows = (1L to 50L).map(i => i -> s"doc $i")
    val dirA = docsFrom(rows)
    val dirB = java.nio.file.Files.createTempDirectory("e9mixb").toString
    spark.read.parquet(s"$dirA/documents.parquet").repartition(7)
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val a = Extended9.t21MixWeights.fn(spark, dirA)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val b = Extended9.t21MixWeights.fn(spark, dirB)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.nonEmpty, "hash-ranked sample must not depend on partitioning")
  }

  test("v12: identical embeddings collapse to one survivor, ranked by centroid proximity") {
    // 10 seed centroids (vec_id 1..10) + two planted exact copies of seed 1's
    // embedding → both land in seed 1's cluster; only the earliest-ranked of
    // the three identical vectors survives
    val base = Array.tabulate(64)(i => (i % 7).toFloat + 1f)
    val others = (2L to 10L).map { id =>
      (id, Array.tabulate(64)(i => ((i * id) % 11).toFloat - 5f), id.toInt)
    }
    val emb = Seq((1L, base, 1), (11L, base, 1), (12L, base, 1)) ++ others
    val df = emb.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("e9emb").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Extended9.v12SemDedup.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(1L)._1 == 1 && out(11L)._1 == 1 && out(12L)._1 == 1,
      "identical vectors assign to the same centroid")
    assert(out(1L)._2 && !out(11L)._2 && !out(12L)._2,
      "exactly the first-ranked copy survives (dist 0, lowest vec_id)")
    assert(others.forall { case (id, _, _) => out(id)._2 },
      "distinct embeddings in other clusters are untouched")
  }

  test("d13: chained near-dup cluster keeps the longest member") {
    // a ~ b ~ c by 3-shingle overlap (chain, not clique); c is longest
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = a + " iota kappa"                     // overlaps a
    val c = b + " lambda mu nu xi omicron pi rho" // overlaps b, longest
    val dir = docsFrom(Seq(1L -> a, 2L -> b, 3L -> c, 4L -> "totally unrelated text here"))
    val out = Extended9.d13ClusterKeepBest.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(Set(1L, 2L, 3L).map(out(_)._1).size == 1, "chain forms one cluster")
    assert(!out(1L)._2 && !out(2L)._2 && out(3L)._2,
      "only the highest-token-count member survives")
    assert(out(4L)._2, "singletons always survive")
  }

  test("m3: window/hop bookkeeping at the boundaries") {
    val dir = docsFrom(Seq(
      1L -> "x" * 48,   // < one hop → exactly 1 window of 48
      2L -> "y" * 100,  // windows at 0 (100 samples) and 50 (50 samples)
      3L -> "z" * 101)) // windows at 0 (100), 50 (51), 100 (1)
    val out = Extended9.m3AudioWindows.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, 0) -> 48L,
      (2L, 0) -> 100L, (2L, 1) -> 50L,
      (3L, 0) -> 100L, (3L, 1) -> 51L, (3L, 2) -> 1L))
  }

  test("m3: energy is the exact integer sum of squared sample values") {
    val dir = docsFrom(Seq(1L -> "AB")) // 'A'=65, 'B'=66
    val r = Extended9.m3AudioWindows.fn(spark, dir).collect().head
    assert(r.getLong(3) == 65L + 66L && r.getLong(4) == 65L * 65 + 66L * 66)
  }
}
