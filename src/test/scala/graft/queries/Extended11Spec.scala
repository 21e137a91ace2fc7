package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Planted-fixture semantics for the Extended11 operators — the intent
  * behind each, which the DuckDB-oracle hash only proves agreement on.
  */
class Extended11Spec extends SparkSuite {
  import spark.implicits._

  private def docsFrom(rows: Seq[(Long, String)]) = {
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("e11docs").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d16: an 8-token run shared by two docs covers exactly those 8 positions") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val dir = docsFrom(Seq(
      1L -> s"$shared ua1 ua2 ua3 ua4",
      2L -> s"$shared ub1 ub2 ub3 ub4",
      3L -> "lone1 lone2 lone3 lone4 lone5 lone6 lone7 lone8 lone9"))
    val out = Extended11.d16RepeatedSpans.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 1 && out(1L).getLong(3) == 8)
    assert(out(1L).getDouble(4) == math.rint(8.0 / 12.0 * 1e4) / 1e4)
    assert(out(3L).getLong(2) == 0 && out(3L).getLong(3) == 0 &&
      out(3L).getDouble(4) == 0.0, "unique doc has zero span coverage")
  }

  test("d16: overlapping shared windows union their covered positions") {
    // a 10-token shared run ⇒ 3 shared windows (positions 1..3), whose
    // covered positions union to 10, not 3×8
    val shared = (1 to 10).map(i => s"r$i").mkString(" ")
    val dir = docsFrom(Seq(1L -> shared, 2L -> shared))
    val out = Extended11.d16RepeatedSpans.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 3, "3 sliding windows over a 10-token run")
    assert(out(1L).getLong(3) == 10, "covered positions are the union")
    assert(out(1L).getDouble(4) == 1.0)
  }

  test("t22: a deterministic collocation scores ln(N/c) when pair always co-occurs") {
    // "foo bar" 6 times and nothing else containing foo/bar:
    // c_ab=6, c_a=c_b=6, B=N-D (docs of 2 tokens each: B = 6 bigrams? see below)
    // corpus: 6 docs "foo bar" → N=12 unigrams, B=6 bigrams
    // pmi = ln((6·12·12)/(6·6·6)) = ln(4)
    val dir = docsFrom((1L to 6L).map(i => i -> "foo bar"))
    val out = Extended11.t22PmiCollocations.fn(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "foo" && r.getString(1) == "bar")
    assert(r.getLong(2) == 6 && r.getLong(3) == 6 && r.getLong(4) == 6)
    assert(math.abs(r.getDouble(5) - math.log(4.0)) < 1e-6)
  }

  test("g8: perfect linear weekly volume recovers the exact slope") {
    // weeks w0..w0+3 with order counts 5,7,9,11 → slope exactly 2.0 and a
    // perfect fit: intercept + slope·week == count at every planted week
    val w0 = 2900L // weeks since epoch
    val rows = for {
      w <- 0 until 4
      i <- 0 until (5 + 2 * w)
    } yield (w.toLong * 1000 + i, 1L, "O", 1.0,
      new java.sql.Timestamp((w0 + w) * 7 * 86400000L), "1-URGENT")
    val df = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("e11ord").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Extended11.g8TrendSlope.fn(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 4)
    assert(r.getDouble(2) == 2.0, s"slope was ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) + 2.0 * w0 - 5.0) < 1e-6,
      "fit passes through (w0, 5)")
  }

  test("e31: EWMA folds in (ts, event_id) order regardless of insertion order") {
    // values arrive REVERSED in the file; time order is 10 then 20:
    // ewma = 0.8·10 + 0.2·20 = 12.0; a single-event key returns its value
    val rows = Seq(
      (2L, 2000000000L, 7L, "click", 20.0, "{}"),
      (1L, 1000000000L, 7L, "click", 10.0, "{}"),
      (3L, 1000000000L, 8L, "view", 42.5, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("e11ev").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Extended11.e31Ewma.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(7L).getLong(1) == 2 && out(7L).getDouble(2) == 12.0)
    assert(out(8L).getLong(1) == 1 && out(8L).getDouble(2) == 42.5)
  }

  test("m4: patch offsets address the row-major 8x16 grid; short docs drop") {
    // 128 distinct chars: row r holds chars r*16..r*16+15; patch (pr,pc)
    // must hash rows pr*4..pr*4+3 sliced at cols pc*4..pc*4+3
    val img = (0 until 128).map(i => ('0' + (i % 75)).toChar).mkString
    val dir = docsFrom(Seq(1L -> img, 2L -> "too short"))
    val out = Extended11.m4Patchify.fn(spark, dir).collect()
    assert(out.length == 8, "2x4 patch grid for the one long-enough doc")
    val p = out.map(r => (r.getInt(1), r.getInt(2)) -> r).toMap
    assert(p((0, 0)).getInt(3) == 0 && p((1, 3)).getInt(3) == 76)
    val expected = (0 until 4).map(r => img.substring(r * 16, r * 16 + 4)).mkString
    val mdExpected = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(p((0, 0)).getString(4) == mdExpected)
  }
}
