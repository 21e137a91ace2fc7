package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Planted-fixture semantics for Extended12: PageRank mass flows toward
  * hubs and the fixed-point arithmetic is exactly reproducible; PQ codes
  * recover the block structure of a planted vector.
  */
class Extended12Spec extends SparkSuite {
  import spark.implicits._

  test("g9: star-graph hub outranks leaves; isolated node keeps exact base rank") {
    // star: item 50 co-visited with each of 51..54 by 3 users apiece;
    // item 99 visited by one lone user (node, but no edges)
    val rows = (for {
      leaf <- 51 to 54
      u <- 0 until 3
    } yield {
      val uid = (leaf - 51) * 3 + u
      Seq((uid * 2L, uid * 1000000000L, uid.toLong, "v", 1.0, s"""{"k": 50}"""),
        (uid * 2L + 1, uid * 1000000000L + 1, uid.toLong, "v", 1.0, s"""{"k": $leaf}"""))
    }).flatten ++ Seq((900L, 900000000000L, 900L, "v", 1.0, """{"k": 99}"""))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("e12ev").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Extended12.g9Pagerank.fn(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (hubPr, hubDeg) = out(50)
    assert(hubDeg == 4 && out(51)._2 == 1 && out(99)._2 == 0)
    assert(hubPr > out(51)._1, "hub accumulates leaf mass")
    assert(out(51)._1 > out(99)._1, "leaves receive hub mass; isolated gets none")
    // N=6 nodes → base term (15·10^6)/(100·6) exactly, every iteration
    assert(out(99)._1 == 25000L, "fixed-point base rank is exact")
    assert((51 to 54).map(out(_)._1).toSet.size == 1, "symmetric leaves tie exactly")
  }

  test("v14: a vector assembled from seed sub-blocks recovers those codes with zero error") {
    // seeds 1 and 2 are constant 1.0f / 3.0f; probe 100 takes seed 2's
    // block in sub-space 0 and seed 1's elsewhere
    def const(v: Float) = Array.fill(64)(v)
    val probe = Array.tabulate(64)(i => if (i < 16) 3.0f else 1.0f)
    val rows = Seq((1L, const(1.0f), 0), (2L, const(3.0f), 1), (100L, probe, 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("e12emb").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Extended12.v14PqCodes.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val p = out(100L)
    assert(p.getLong(1) == 2L && p.getLong(2) == 1L && p.getLong(3) == 1L &&
      p.getLong(4) == 1L, "codes follow the planted block structure")
    assert(p.getDouble(5) == 0.0, "exact block match has zero reconstruction error")
    assert(out(1L).getDouble(5) == 0.0 && out(2L).getDouble(5) == 0.0,
      "seeds quantize to themselves")
  }
}
