package graft

import org.apache.spark.sql.functions._

/** a8_approx_sketches hashes exact answers + in-bounds booleans (sketch
  * internals are engine-specific); this spec asserts the TIGHTER 1σ bound
  * on the raw sketch values the query's 3σ gate is built from. */
class ApproxSpec extends SparkSuite {

  test("a8 bound booleans are all true") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("a8_approx_sketches")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} distinct_ok false")
      assert(r.getBoolean(3), s"${r.getString(0)} median_ok false")
    }
  }

  test("approx distinct and median stay within tolerance of exact") {
    val d = "/root/testdata/sf0.01"
    val approx = Tables.lineitem(spark, d).groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey"), 0.05).as("ap"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("am"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, d).groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("parts"), median(col("l_quantity")).as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (parts, med)) =>
      val (ap, am) = approx(k)
      assert(math.abs(ap - parts).toDouble / parts < 0.05, s"$k distinct: $ap vs $parts")
      assert(math.abs(am - med) <= 1.0, s"$k median: $am vs $med")
    }
  }

  test("hash split is deterministic and near the expected fractions") {
    val d = "/root/testdata/sf0.01"
    val q = SparkEntry.queries("t5_hash_sample")(spark, d)
    val a = q.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = q.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
    val testFrac = a.values.count(_ == "test").toDouble / a.size
    assert(testFrac > 0.06 && testFrac < 0.20, s"test fraction $testFrac")
  }
}
