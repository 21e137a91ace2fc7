package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Planted-fixture semantics for Extended13: clustering coefficient on a
  * known clique-plus-pendant, and cross-partition carry correctness of
  * the distributed prefix-sum concurrency gauge.
  */
class Extended13Spec extends SparkSuite {
  import spark.implicits._

  private def eventsFrom(rows: Seq[(Long, Long, Long, String)]) = {
    val df = rows.map { case (eid, tNs, uid, k) =>
      (eid, tNs, uid, "v", 1.0, s"""{"k": $k}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("e13ev").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("g10: K4-plus-pendant yields cc=1 inside the clique, cc=0.5 at the cut vertex") {
    // 3 users visit all of {1,2,3,4} (6 clique pairs, count 3 each);
    // 3 more visit {1,5} (pendant pair, count 3) — relative bar keeps all
    var eid = 0L
    val rows = (for {
      u <- 0 until 3; k <- Seq(1L, 2L, 3L, 4L)
    } yield { eid += 1; (eid, eid * 1000000000L, u.toLong, k.toString) }) ++
      (for {
        u <- 10 until 13; k <- Seq(1L, 5L)
      } yield { eid += 1; (eid, eid * 1000000000L, u.toLong, k.toString) })
    val dir = eventsFrom(rows)
    val out = Extended13.g10TriangleCc.fn(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(2) == ((3L, 3L, 1.0)), "pure clique member: deg 3, 3 triangles, cc 1")
    assert(out(1) == ((4L, 3L, 0.5)), "cut vertex: deg 4, same 3 triangles, cc 0.5")
    assert(!out.contains(5), "degree-1 pendant has no defined cc")
  }

  test("e33: a lease spanning an hour boundary carries into the next partition") {
    // A opens at t=3590s (hour 0), closes 4190 (hour 1); B opens 3700
    // (hour 1) while A is still open → peak concurrency 2 in bucket 4,
    // which is only correct if hour 1 receives hour 0's +1 as carry
    val dir = eventsFrom(Seq(
      (1L, 3590L * 1000000000L, 1L, "9"),
      (2L, 3700L * 1000000000L, 2L, "9")))
    val out = Extended13.e33Concurrency.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(3L) == ((1L, 1L)), "bucket 3: A opens alone")
    assert(out(4L) == ((2L, 3L)), "bucket 4: B overlaps A (carry), then both close")
    assert(out.size == 2)
  }
}
