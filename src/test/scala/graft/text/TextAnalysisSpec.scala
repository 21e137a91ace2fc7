package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column) =
    Seq(text).toDF("text").select(c).head()

  test("tokens: whitespace-robust, empties removed") {
    assert(one("  a   b\tc ", TextAnalysis.tokens(col("text")))
      .getSeq[String](0) == Seq("a", "b", "c"))
    assert(one("", TextAnalysis.tokenCount(col("text"))).getInt(0) == 0)
  }

  test("regex token count: alnum runs + punctuation marks") {
    assert(one("ab, cd! 12", TextAnalysis.regexTokenCount(col("text"))).getInt(0) == 5)
  }

  test("distinct and stopword ratios") {
    val df = Seq("the cat the dog").toDF("text")
    val r = df.select(
      TextAnalysis.distinctRatio(col("text")).as("d"),
      TextAnalysis.stopwordRatio(col("text"), Seq("a", "the")).as("s")).head()
    assert(r.getDouble(0) == 0.75) // {the,cat,dog}/4
    assert(r.getDouble(1) == 0.5)  // 2×"the"/4
  }

  test("langId: argmax with priority tiebreak, und when no markers") {
    val markers = TextQueriesMarkers.markers
    assert(one("stream batch window window", TextAnalysis.langId(col("text"), markers))
      .getString(0) == "streamish")
    assert(one("zzz qqq", TextAnalysis.langId(col("text"), markers))
      .getString(0) == "und")
    // tie between sqlish and storish → earlier (alphabetical) wins
    assert(one("query row", TextAnalysis.langId(col("text"), markers))
      .getString(0) == "sqlish")
  }

  test("fingerprint is token-order-insensitive; content hash is not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(
      TextAnalysis.fingerprint(col("x")) === TextAnalysis.fingerprint(col("y")),
      TextAnalysis.normalizedHash(col("x")) === TextAnalysis.normalizedHash(col("y"))).head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}

/** Exposes the query battery's marker vocabularies for testing. */
object TextQueriesMarkers {
  val markers: Map[String, Seq[String]] = graft.queries.TextQueries.markers
}
