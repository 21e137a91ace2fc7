package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 50: deterministic k-means++ seeding and
  * curriculum mixture scheduling.
  */
object Extended50 {

  /** V26 — k-means++ initialization (Arthur–Vassilvitskii SODA'07) made
    * reproducible: each round picks the next center by a D²-weighted
    * HASH RACE — priority(x) = u(x)/d²(x) with u a per-(round, vector)
    * md5 uniform, minimum priority wins (large d² ⇒ small priority ⇒
    * favored, the deterministic analog of D² sampling; same hash-race
    * discipline as p11's priority sample). d² is the v-family's
    * bit-identical fixed-order sum and the priority is ONE IEEE division
    * of bit-identical doubles, so both engines race identically; ties
    * break by id. Output: the 5 seeds with their selection d².
    *
    * Shape at scale: per round one broadcast of ≤5 centers + one scan
    * (min-dist) + one argmin agg — O(k·n), no pairwise term; the
    * classic tradeoff vs p15's farthest-first is spread-with-noise
    * instead of pure spread. */
  val v26KmeansppInit = q("v26_kmeanspp_init", {
    def dSql(a: String, b: String) =
      s"""list_sum(list_transform(generate_series(1, 64),
         |  i -> (CAST($a[CAST(i AS INT)] AS DOUBLE) - CAST($b[CAST(i AS INT)] AS DOUBLE)) ^ 2))""".stripMargin
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
         |ch0 AS (SELECT CAST(0 AS BIGINT) AS rank, vec_id, CAST(0 AS DOUBLE) AS d2
         |        FROM e WHERE vec_id = 0)""".stripMargin)
    for (t <- 1 to 4) sb.append(
      s""",
         |md$t AS (
         |  SELECT x.vec_id, min(${dSql("x.v", "c.v")}) AS d2
         |  FROM e x JOIN e c ON c.vec_id IN (SELECT vec_id FROM ch${t - 1})
         |  WHERE x.vec_id NOT IN (SELECT vec_id FROM ch${t - 1})
         |  GROUP BY 1),
         |pk$t AS (
         |  SELECT CAST($t AS BIGINT) AS rank, vec_id, d2 FROM md$t
         |  WHERE d2 > 0
         |  ORDER BY CAST(('0x' || substr(md5('kpp:$t:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS DOUBLE) / d2 ASC,
         |           vec_id ASC LIMIT 1),
         |ch$t AS (SELECT * FROM ch${t - 1} UNION ALL SELECT * FROM pk$t)""".stripMargin)
    sb.append(
      s"""
         |SELECT rank, vec_id, ${rnd("d2", 4)} AS d2 FROM ch4""".stripMargin)
    sb.toString
  }) { (s, d) =>
    def sq(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, z) => acc + z)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    var chosen = emb.where(col("vec_id") === 0)
      .select(lit(0L).as("rank"), col("vec_id"), lit(0.0).as("d2"))
    for (t <- 1 to 4) {
      val centers = chosen.select(col("vec_id").as("cid"))
        .join(emb.withColumnRenamed("vec_id", "cid"), Seq("cid"))
        .select(col("cid"), col("v").as("cv"))
      val u = (graft.functions.HexPrefixLong(
        md5(concat(lit(s"kpp:$t:"), col("vec_id").cast("string"))), 8) + 1L)
        .cast("double")
      val pick = emb
        .join(broadcast(chosen.select(col("vec_id"))), Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(centers))
        .groupBy("vec_id").agg(min(sq(col("v"), col("cv"))).as("d2"))
        .where(col("d2") > 0)
        .agg(min(struct((u / col("d2")).as("pri"), col("vec_id").as("id"),
          col("d2").as("dd"))).as("m"))
        .select(lit(t.toLong).as("rank"), col("m.id").as("vec_id"),
          col("m.dd").as("d2"))
      chosen = chosen.unionByName(pick).localCheckpoint(true)
    }
    chosen.select(col("rank"), col("vec_id"), round(col("d2"), 4).as("d2"))
  }

  /** P17 — annealed mixture schedule (curriculum from natural to
    * uniform): over 5 epochs the per-source sampling weight interpolates
    * w_e(s) = (1−λ)·n_s/N + λ/k with λ = e/4 — the standard "start on
    * the natural distribution, end balanced" curriculum for multi-source
    * pretraining. Weights are exact integer micro-units
    * (parts-per-10¹²): both mixture terms are integer div expressions,
    * so every cell of the 5×k schedule is exact, and the per-epoch sums
    * expose the (deliberate, bounded-by-k·4) flooring shortfall that a
    * downstream largest-remainder pass (p13) would re-distribute.
    *
    * Shape at scale: one source-count agg; the schedule itself is
    * k·epochs rows of pure arithmetic — driver-negligible, shuffle-free
    * beyond the count. */
  val p17MixtureSchedule = q("p17_mixture_schedule",
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k FROM c),
      |ep AS (SELECT CAST(u.e AS BIGINT) AS epoch FROM range(0, 5) u(e))
      |SELECT epoch, source, n,
      |       CAST(((4 - epoch) * CAST(n AS HUGEINT) * 1000000000000) // (4 * nn)
      |          + (epoch * CAST(1000000000000 AS HUGEINT)) // (4 * k) AS BIGINT) AS w_ppt,
      |       CAST((CAST(n AS HUGEINT) * 1000000000000) // nn AS BIGINT) AS natural_ppt
      |FROM c, tot, ep""".stripMargin) { (s, d) =>
    scheduleFromCounts(s,
      Tables.documents(s, d).groupBy("source").agg(count(lit(1)).as("n")))
  }

  /** The p17 schedule off a `(source, n)` counts frame — factored out so
    * MixtureScheduleSpec can drive it with synthetic multi-billion-doc
    * counts (where BIGINT would wrap) and check exactness against BigInt.
    *
    * The n·10¹² product runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB):
    * in BIGINT it wraps silently at ~9.2M docs per source in Spark while
    * DuckDB raises — wide integers keep both engines exact to ~10²⁵
    * docs, far past any physical corpus, with identical results. */
  def scheduleFromCounts(s: org.apache.spark.sql.SparkSession,
      c: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tot = c.agg(sum("n").cast("long").as("nn"), count(lit(1)).as("k"))
    val ep = s.range(0, 5).select(col("id").as("epoch"))
    c.crossJoin(broadcast(tot)).crossJoin(broadcast(ep))
      .select(col("epoch"), col("source"), col("n"),
        (expr("((4 - epoch) * CAST(n AS DECIMAL(38,0)) * 1000000000000) div (4 * nn)") +
          expr("(epoch * CAST(1000000000000 AS DECIMAL(38,0))) div (4 * k)")).as("w_ppt"),
        expr("(CAST(n AS DECIMAL(38,0)) * 1000000000000) div nn").as("natural_ppt"))
  }

  val all: Seq[Q] = Seq(v26KmeansppInit, p17MixtureSchedule)
}
