package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.TitleMainCode

class GraftExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("custom expressions callable from SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT seconds_to_hms(90061) AS hms, title_main_code('Drama | QB7x') AS mc")
      .head()
    assert(r.getString(0) == "1 day, 1:01:01")
    assert(r.getString(1) == "QB7x")
  }

  test("extensions class injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("fused TitleMainCode ≡ composed Column chain on a title corpus") {
    val titles = Seq("Morning News | ABC4", "Evening Talk | K6A", "Recap 2025",
      "chat with friends", "Drama Serial | QB7x", "Video | funny", "",
      "   ", "A|B|K9Q", "x", "ALLCAPS", "AB1", "ab1", "aB1", "12345",
      "trailing pipe |", "| QB", "tab\tsep\tQ7A")
    val df = titles.toDF("t")
    val both = df.select(
      graft.ops.TitleCode.mainCode(col("t")).as("chain"),
      TitleMainCode.titleMainCode(col("t")).as("fused")).collect()
    both.zip(titles).foreach { case (r, t) =>
      assert(r.getString(0) == r.getString(1), s"divergence on '$t'")
    }
  }
}
