package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** F12 — exact CPython str(timedelta) parity, incl. day prefix and
  * negative floor-division behavior (dataprocessing.py:150). */
class SecondsToHmsSpec extends SparkSuite {
  import spark.implicits._

  test("known goldens match Python str(timedelta)") {
    val cases = Map(
      0L -> "0:00:00",
      271L -> "0:04:31",
      3599L -> "0:59:59",
      3661L -> "1:01:01",
      86399L -> "23:59:59",
      86400L -> "1 day, 0:00:00",
      90061L -> "1 day, 1:01:01",
      172800L -> "2 days, 0:00:00",
      -10L -> "-1 day, 23:59:50")
    cases.foreach { case (s, want) =>
      assert(SecondsToHms.format(s) == want, s"format($s)")
    }
  }

  test("codegen expression equals interpreted eval on a column") {
    val df = (Seq(0L, 59L, 3600L, 86400L, 90061L, 200000L, -5L)).toDF("s")
    val got = df.select(col("s"), SecondsToHms.secondsToHms(col("s")).as("hms"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (s, hms) => assert(hms == SecondsToHms.format(s)) }
  }

  test("property: total function with well-formed H:MM:SS tail") {
    val prop = Prop.forAll(Gen.chooseNum(-10000000L, 10000000L)) { s =>
      val out = SecondsToHms.format(s)
      val hms = out.split(", ").last
      hms.matches("\\d+:[0-5]\\d:[0-5]\\d")
    }
    assert(check(Parameters.default.withMinSuccessfulTests(500), prop).passed)
  }
}
