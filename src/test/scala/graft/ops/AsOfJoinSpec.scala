package graft.ops

import graft.SparkSuite
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches latest right row at-or-before; null when none") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "u2", ts("2024-01-01 10:00:00"))  // key with no right rows
    ).toDF("id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 100.0),
      ("u1", ts("2024-01-01 11:00:00"), 200.0),
      ("u1", ts("2024-01-01 12:00:00"), 300.0)  // simultaneous with left id=2
    ).toDF("user_id", "ts", "price")

    val got = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("asof_price"))) None
         else Some(r.getDouble(r.fieldIndex("asof_price"))))).toMap
    assert(got(1L) == Some(100.0))
    assert(got(2L) == Some(300.0)) // >= semantics: equal-ts right matches
    assert(got(3L) == None)
    assert(got(4L) == None)
  }

  test("forward: matches earliest right row at-or-after; null when none") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // next right at 11:00
      (2L, "u1", ts("2024-01-01 12:00:00")), // simultaneous right matches
      (3L, "u1", ts("2024-01-01 12:30:00")), // after all right rows
      (4L, "u2", ts("2024-01-01 10:00:00"))  // key with no right rows
    ).toDF("id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 100.0),
      ("u1", ts("2024-01-01 11:00:00"), 200.0),
      ("u1", ts("2024-01-01 12:00:00"), 300.0)
    ).toDF("user_id", "ts", "price")

    val got = AsOfJoin.asOfForward(left, right, "user_id", "ts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("asof_price"))) None
         else Some(r.getDouble(r.fieldIndex("asof_price"))))).toMap
    assert(got(1L) == Some(200.0))
    assert(got(2L) == Some(300.0)) // >= semantics: equal-ts right matches
    assert(got(3L) == None)
    assert(got(4L) == None)
  }
}
