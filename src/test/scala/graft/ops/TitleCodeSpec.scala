package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Golden micro-cases for F1–F7 (exact reference semantics,
  * dataingestion2.py:33-64). */
class TitleCodeSpec extends SparkSuite {
  import spark.implicits._

  private def run(titles: Seq[String]) =
    titles.toDF("t").select(
      TitleCode.mainCode(col("t")).as("main"),
      TitleCode.codePrefix(TitleCode.mainCode(col("t"))).as("code"),
      TitleCode.lastChar(TitleCode.mainCode(col("t")))
        .as("rc")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("last word extraction with pipe normalization") {
    val Array(r) = run(Seq("Morning News | ABC4"))
    assert(r == (("ABC4", "AB", "4")))
  }

  test("len-3 code keeps full prefix") {
    val Array(r) = run(Seq("Evening Talk | K6A"))
    assert(r == (("K6A", "K6A", "A")))
  }

  test("all-digit last word purged (e.g. year)") {
    assert(run(Seq("Recap 2025")).head._1 == "")
  }

  test("length not in {3,4,5} purged") {
    assert(run(Seq("chat with friends")).head._1 == "")
    assert(run(Seq("Show | ab")).head._1 == "")
  }

  test("more than one lowercase char purged; exactly one allowed") {
    assert(run(Seq("Video | funny")).head._1 == "")
    val Array(r) = run(Seq("Drama Serial | QB7x"))
    assert(r == (("QB7x", "QB", "x")))
  }

  test("null / empty / whitespace titles yield blanks") {
    val df = Seq[Option[String]](None, Some(""), Some("   ")).toDF("t")
    val got = df.select(TitleCode.mainCode(col("t"))).collect().map(_.getString(0))
    assert(got.forall(_ == ""))
  }
}
