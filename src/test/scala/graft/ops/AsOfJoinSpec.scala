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

  test("duplicate right timestamps resolve deterministically to the max payload") {
    // several right rows share (key, ts): without the tertiary __p sort the
    // survivor depends on shuffle arrival order. The contract is the MAX
    // payload struct wins, in both directions, regardless of partitioning.
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00"))
    ).toDF("id", "user_id", "ts")
    for (seed <- 0 until 4) {
      // shuffle right-side input order and partitioning per iteration
      val rows = new scala.util.Random(seed).shuffle(Seq(
        ("u1", ts("2024-01-01 09:30:00"), 100.0),
        ("u1", ts("2024-01-01 09:30:00"), 150.0),
        ("u1", ts("2024-01-01 09:30:00"), 50.0),
        ("u1", ts("2024-01-01 11:00:00"), 300.0),
        ("u1", ts("2024-01-01 11:00:00"), 200.0)))
      val right = rows.toDF("user_id", "ts", "price")
        .repartition(1 + seed % 3)
      val back = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("price"))
        .collect().map(r => r.getLong(0) ->
          r.getDouble(r.fieldIndex("asof_price"))).toMap
      assert(back(1L) == 150.0, s"seed=$seed: backward tie must carry max payload")
      assert(back(2L) == 300.0, s"seed=$seed")
      val fwd = AsOfJoin.asOfForward(left, right, "user_id", "ts", Seq("price"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(r.fieldIndex("asof_price"))) None
           else Some(r.getDouble(r.fieldIndex("asof_price"))))).toMap
      assert(fwd(1L) == Some(300.0), s"seed=$seed: forward tie must carry max payload")
      assert(fwd(2L) == None, s"seed=$seed: no right row at/after 12:00")
    }
  }
}
