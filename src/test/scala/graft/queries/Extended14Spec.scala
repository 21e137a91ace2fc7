package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Planted-fixture semantics for Extended14: containment catches the
  * doc-inside-doc case Jaccard misses; keyphrases surface the planted
  * topical token.
  */
class Extended14Spec extends SparkSuite {
  import spark.implicits._

  private def docsFrom(rows: Seq[(Long, String)]) = {
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("e14docs").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d17: a fully-quoted short doc scores overlap 1.0 while Jaccard stays low") {
    // doc 2 = doc 1's first 12 tokens; doc 1 has 60 tokens → Jaccard
    // ≈ 10/58 ≈ 0.17 but containment = 1.0
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val dir = docsFrom(Seq(1L -> long, 2L -> short))
    val out = Extended14.d17Containment.fn(spark, dir).collect()
    assert(out.length == 1, "LSH banding must surface the pair")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 10 && r.getLong(3) == 58 && r.getLong(4) == 10,
      "10 shared 3-shingles; subset side has exactly 10")
    assert(r.getDouble(5) == 1.0, "overlap coefficient flags full containment")
    // cross-check: symmetric Jaccard on the same pair stays far below 1
    val jac = graft.text.NearDup.jaccardOnPairs(
      graft.Tables.documents(spark, dir).select("doc_id", "text"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), "doc_id", col("text"), 3)
      .collect().head.getDouble(2)
    assert(jac < 0.2, s"Jaccard $jac should miss the containment")
  }

  test("t23: the planted high-TF rare token tops the keyphrases") {
    // 'zzz' appears 5x in doc 1 only; filler tokens appear in every doc
    val dir = docsFrom(Seq(
      1L -> "zzz zzz zzz zzz zzz common1 common2 common3",
      2L -> "common1 common2 common3 other1",
      3L -> "common1 common2 common3 other2"))
    val out = Extended14.t23Keyphrases.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).startsWith("zzz"), s"doc 1 keyphrases were ${out(1L)}")
    assert(!out(2L).contains("zzz"))
  }
}
