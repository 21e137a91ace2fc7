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

  test("graft_table_changes TVF serves the row-level feed from SQL") {
    import graft.sinks.AtomicWarehouse
    val dir = java.nio.file.Files.createTempDirectory("tvf_cdf")
      .toString + "/wh"
    val rows = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "load_seq")
    AtomicWarehouse.commitEpoch(spark, dir, rows, 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1
    AtomicWarehouse.purgeKeysDeferred(spark, dir, "k", Seq(2L)) // v2
    val got = spark.sql(
      s"SELECT k, v, _change_type, _commit_version " +
        s"FROM graft_table_changes('$dir', 1)")
      .collect().map(r => (r.getLong(0), r.isNullAt(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got == Set((1L, false, "insert", 1L), (2L, false, "insert", 1L),
      (2L, true, "delete", 2L)), s"$got")
    // bounded range via the third argument (inclusive)
    assert(spark.sql(s"SELECT * FROM graft_table_changes('$dir', 2, 2)")
      .count() == 1)
    // non-literal arguments are refused at analysis, not silently wrong
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_changes('$dir', k) " +
        s"CROSS JOIN VALUES (1) t(k)").collect()
    }
  }

  test("extensions class injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }

  test("hex_topbits_pack from SQL: packs md5 top bits") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT hex_topbits_pack('ffff0000') AS p, hex_topbits_pack(md5('x')) AS pm")
      .head()
    val full = 1L + (1L << 16) + (1L << 32) + (1L << 48)
    assert(r.getSeq[Long](0) == Seq.tabulate(16)(f => if (f == 0) full else 0L),
      "'ffff' fills field 0, '0000' leaves field 1 empty")
    assert(r.getSeq[Long](1).length == 16)
  }

  test("bloom_might_contain from SQL: no false negatives, few false positives") {
    GraftExtensions.register(spark)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (0L until 1000L by 2).foreach(bloom.putLong) // evens only
    val hex = graft.functions.BloomMightContain.serialize(bloom)
      .map("%02X".format(_)).mkString
    val r = spark.sql(
      s"""SELECT sum(CASE WHEN bloom_might_contain(id, X'$hex') THEN 1 ELSE 0 END)
         |FROM range(0, 1000)""".stripMargin).head().getLong(0)
    assert(r >= 500, "false negatives are impossible, every even must hit")
    assert(r <= 550, s"odd-id false positives out of bound: ${r - 500} of 500")
  }

  test("vec_dot from SQL: codegen expression ≡ HOF form, interpreted ≡ codegen") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       vec_dot(array(1.0D), array(2.0D, 99.0D)) AS short_pad,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nul
        |""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 2.0) // min-length semantics
    assert(r.isNullAt(2))
    // interpreted path (nullSafeEval) agrees with codegen
    val hof = spark.sql(
      """SELECT aggregate(zip_with(array(1.5D, -2.25D), array(3.0D, 8.0D),
        |                          (x, y) -> x * y), 0.0D, (a, x) -> a + x) AS d,
        |       vec_dot(array(1.5D, -2.25D), array(3.0D, 8.0D)) AS v""".stripMargin).head()
    assert(hof.getDouble(0) == hof.getDouble(1))
  }

  test("property: fused TitleMainCode ≡ composed Column chain on random strings") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // strings over a vocabulary that hits every branch: separators,
    // digits, lower/upper, token lengths around the {3,4,5} gate
    val tokenGen = Gen.oneOf(
      Gen.stringOfN(2, Gen.alphaNumChar), Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.stringOfN(4, Gen.alphaNumChar), Gen.stringOfN(5, Gen.alphaNumChar),
      Gen.stringOfN(6, Gen.alphaNumChar), Gen.numStr.map(_.take(4)),
      Gen.const(""), Gen.const("|"))
    val titleGen = Gen.listOf(tokenGen).map(_.mkString(" "))
    val titles = Gen.listOfN(300, titleGen).sample.getOrElse(Nil)
    val df = titles.toDF("t")
    val rows = df.select(
      graft.ops.TitleCode.mainCode(col("t")).as("chain"),
      TitleMainCode.titleMainCode(col("t")).as("fused")).collect()
    rows.zip(titles).foreach { case (r, t) =>
      assert(r.getString(0) == r.getString(1), s"divergence on '$t'")
    }
    // plus plain scalacheck over the pure function vs a reference impl
    val prop = Prop.forAll(titleGen) { t =>
      val norm = t.replace('|', ' ').split("\\s+").filter(_.nonEmpty)
      val last = norm.lastOption.getOrElse("")
      val expect =
        if (last.length < 3 || last.length > 5) ""
        else if (last.nonEmpty && last.forall(_.isDigit)) ""
        else if (last.count(c => c >= 'a' && c <= 'z') > 1) ""
        else last
      TitleMainCode.compute(t) == expect
    }
    assert(check(Parameters.default.withMinSuccessfulTests(2000), prop).passed)
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
