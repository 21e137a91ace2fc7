package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.TitleCode

/** The fuse rule is injected at session creation via GraftExtensions
  * (injectPostHocResolutionRule); here it is exercised directly against
  * analyzed plans — the exact tree shape it sees in a session started
  * with spark.sql.extensions=graft.GraftExtensions. */
class FuseTitleCodeSpec extends SparkSuite {
  import spark.implicits._

  private val titles: Seq[String] = Seq(
    "Morning News | ABC4", "Recap 2025", "chat here", "Drama | QB7x",
    null, "", "   ", "A|B|K9Q", "12345", "ab1", "AB1")

  /** Parquet-backed frame: a LocalRelation would be constant-folded away
    * during optimization, hiding the fused expression from the executed
    * plan. */
  private lazy val parquetTitles: DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("fuse_titles").toString
    titles.toDF("t").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rule fuses the analyzed chain into title_main_code") {
    val df = parquetTitles.select(TitleCode.mainCode(col("t")).as("mc"))
    val fusedPlan = FuseTitleCode(df.queryExecution.analyzed)
    val s = fusedPlan.toString
    assert(s.contains("title_main_code"), "rule did not fire:\n" + s)
    assert(!s.contains("element_at"), "composed chain survived:\n" + s)
  }

  test("fused plan executes and matches unfused results, null → \"\"") {
    val df = parquetTitles.select(col("t"), TitleCode.mainCode(col("t")).as("mc"))
    val unfused = df.collect()
      .map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    val fusedPlan = FuseTitleCode(df.queryExecution.analyzed)
    assert(fusedPlan.toString.contains("title_main_code"))
    val fused = GraftBridge.ofRows(spark, fusedPlan).collect()
      .map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(fused == unfused)
    assert(fused(None) == "") // null title → "", not null
  }

  test("non-matching variations are left untouched") {
    // different separator normalization — must NOT fuse
    val variant = {
      val norm = trim(translate(coalesce(col("t"), lit("")), "/", " "))
      val lastWord = when(norm === "", lit(""))
        .otherwise(element_at(split(norm, "\\s+"), -1))
      TitleCode.purgeInvalid(lastWord)
    }
    val p1 = FuseTitleCode(parquetTitles.select(variant.as("mc"))
      .queryExecution.analyzed).toString
    assert(!p1.contains("title_main_code"), "over-eager fuse:\n" + p1)

    // outer branch around the exact chain: inner chain may fuse, outer
    // CASE must survive with its sentinel branch
    val extra = when(col("t") === "sentinel", lit("X"))
      .otherwise(TitleCode.mainCode(col("t")))
    val p2 = FuseTitleCode(parquetTitles.select(extra.as("mc"))
      .queryExecution.analyzed).toString
    assert(p2.contains("sentinel"), p2)
  }
}
