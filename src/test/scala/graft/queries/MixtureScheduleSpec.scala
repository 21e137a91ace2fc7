package graft.queries

import graft.SparkSuite

/** p17's weight arithmetic must stay exact at real corpus scale: the
  * n·10¹² products exceed Long past ~9.2M docs per source, where BIGINT
  * would wrap silently on the Spark side (and raise on DuckDB's — the
  * worst cross-engine divergence class). The battery runs at sf0.1; this
  * spec drives the same factored-out computation with synthetic counts in
  * the billions and checks every cell against driver-side BigInt. */
class MixtureScheduleSpec extends SparkSuite {
  import spark.implicits._

  test("schedule weights are BigInt-exact for multi-billion-doc sources") {
    val counts = Seq(
      ("web", 10_000_000L),          // the first Long-wrap point is ~9.2M
      ("code", 3_000_000_000L),      // past Int, past naive salting tricks
      ("books", 42L),                // tiny source alongside huge ones
      ("synth", 9_300_000_000_000L)) // 9.3e12 docs -> n*10^12 ~ 9.3e24
    val df = Extended50.scheduleFromCounts(spark, counts.toDF("source", "n"))
      .collect()
    assert(df.length == counts.length * 5)

    val nn = BigInt(counts.map(_._2).sum)
    val k = BigInt(counts.length)
    val t = BigInt("1000000000000")
    // `div` over DECIMAL operands yields LONG in Spark; the wide type
    // lives in the intermediate products, which is where wrap would occur
    val byKey = df.map { r =>
      (r.getLong(0), r.getString(1)) -> (BigInt(r.getLong(3)), BigInt(r.getLong(4)))
    }.toMap
    for ((src, nL) <- counts; e <- 0L to 4L) {
      val n = BigInt(nL)
      val expectedW =
        (BigInt(4 - e) * n * t) / (BigInt(4) * nn) + (BigInt(e) * t) / (BigInt(4) * k)
      val expectedNat = n * t / nn
      val (gotW, gotNat) = byKey((e, src))
      assert(gotW == expectedW, s"w_ppt($e, $src): got $gotW, want $expectedW")
      assert(gotNat == expectedNat, s"natural_ppt($e, $src)")
    }
    // sanity: epoch 0 is the natural distribution, epoch 4 is uniform
    for ((src, nL) <- counts) {
      assert(byKey((0L, src))._1 == BigInt(nL) * t / nn)
      assert(byKey((4L, src))._1 == t / k) // floor(4t/4k) == floor(t/k)
    }
  }
}
