package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The winnowing guarantee (Schleimer/Wilkerson/Aiken, SIGMOD 2003): with
  * k-token shingles and window w over the shingle-hash sequence, any two
  * documents sharing a token run of length ≥ w + k - 1 share at least one
  * selected fingerprint. Checked over generated doc pairs with planted
  * shared runs, plus the no-sharing converse on disjoint vocabularies. */
class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private val k = 3 // shingle tokens
  private val w = 4 // hash window

  /** Mirror of t7's fingerprint-set computation. */
  private def fingerprints(df: org.apache.spark.sql.DataFrame) = {
    val hs = transform(NearDup.shingles(col("text"), k), x => md5(x))
    val mins = when(size(hs) < w, array(array_min(hs)))
      .otherwise(transform(sequence(lit(1), size(hs) - (w - 1)),
        i => array_min(slice(hs, i, lit(w)))))
    df.select(col("doc_id"), array_distinct(mins).as("fps"))
  }

  test("planted shared runs of w+k-1 tokens always share a fingerprint") {
    val rnd = new scala.util.Random(7)
    def tokens(n: Int, vocab: String) =
      Seq.fill(n)(vocab + rnd.nextInt(500))
    val docs = (0 until 40).flatMap { i =>
      val shared = tokens(w + k - 1, s"shared${i}_") // guarantee threshold
      val a = tokens(rnd.nextInt(30), "a_") ++ shared ++ tokens(rnd.nextInt(30), "a_")
      val b = tokens(rnd.nextInt(30), "b_") ++ shared ++ tokens(rnd.nextInt(30), "b_")
      Seq((2L * i, a.mkString(" ")), (2L * i + 1, b.mkString(" ")))
    }
    val fps = fingerprints(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (0 until 40).foreach { i =>
      val inter = fps(2L * i) intersect fps(2L * i + 1)
      assert(inter.nonEmpty, s"pair $i shares a ${w + k - 1}-token run but no fingerprint")
    }
  }

  test("disjoint vocabularies share no fingerprints") {
    val a = (0 until 50).map("alpha" + _).mkString(" ")
    val b = (0 until 50).map("beta" + _).mkString(" ")
    val fps = fingerprints(Seq((0L, a), (1L, b)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert((fps(0L) intersect fps(1L)).isEmpty)
  }
}
