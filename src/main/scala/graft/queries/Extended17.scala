package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.vec.Similarity

/** Round-2 widening, part 17: staged (Matryoshka) vector retrieval, the
  * out-of-order-arrival audit that sizes streaming watermarks, and the
  * SQL-surface form of the co-located warehouse star.
  */
object Extended17 {

  /** V16 — Matryoshka staged retrieval (Kusupati et al. '22): search on
    * the PREFIX 16 dims of the embedding (4× less IO — matryoshka-trained
    * embeddings front-load information), keep the top-100 coarse
    * candidates, then rerank ONLY those with the full 64-dim cosine for
    * the final top-10. Both stages round scores to 3dp before ranking
    * with a vec_id tie-break, so candidate sets and final ranks are
    * engine-exact.
    *
    * Shape at scale: stage 1 scans a 16-dim slice (a quarter of the
    * vector bytes — with a columnar layout storing prefix dims separately
    * it's a quarter of the IO); stage 2 touches 100 vectors regardless of
    * corpus size. The single query broadcasts; no shuffle except the
    * top-k's TakeOrdered merge. */
  val v16Matryoshka = q("v16_matryoshka_rerank",
    s"""WITH v AS (
       |  SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN range(1, 65) t(i)),
       |n16 AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v WHERE i <= 16 GROUP BY 1),
       |n64 AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v GROUP BY 1),
       |coarse AS (
       |  SELECT c.vec_id,
       |         ${rnd("sum(q.x * c.x) / (nq.nrm * nc.nrm)", 3)} AS coarse_cos
       |  FROM v c
       |  JOIN v q ON q.vec_id = 7 AND q.i = c.i AND q.i <= 16
       |  JOIN n16 nq ON nq.vec_id = 7
       |  JOIN n16 nc ON nc.vec_id = c.vec_id
       |  WHERE c.vec_id <> 7 AND c.i <= 16
       |  GROUP BY 1, nq.nrm, nc.nrm),
       |cand AS (
       |  SELECT vec_id, coarse_cos,
       |         row_number() OVER (ORDER BY coarse_cos DESC, vec_id ASC) AS crn
       |  FROM coarse QUALIFY crn <= 100),
       |fsc AS (
       |  SELECT c.vec_id,
       |         ${rnd("sum(q.x * c.x) / (nq.nrm * nc.nrm)", 3)} AS full_cos
       |  FROM v c
       |  JOIN v q ON q.vec_id = 7 AND q.i = c.i
       |  JOIN n64 nq ON nq.vec_id = 7
       |  JOIN n64 nc ON nc.vec_id = c.vec_id
       |  WHERE c.vec_id IN (SELECT vec_id FROM cand)
       |  GROUP BY 1, nq.nrm, nc.nrm)
       |SELECT f.vec_id, c.coarse_cos, f.full_cos, CAST(rn AS INT) AS rn FROM (
       |  SELECT vec_id, full_cos,
       |         row_number() OVER (ORDER BY full_cos DESC, vec_id ASC) AS rn
       |  FROM fsc) f
       |JOIN cand c ON c.vec_id = f.vec_id
       |WHERE rn <= 10""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("cv"))
    val qrow = emb.where(col("vec_id") === 7)
      .select(col("cv").as("qv"), slice(col("cv"), 1, 16).as("qv16"))
    val corpus = emb.where(col("vec_id") =!= 7)
      .withColumn("cv16", slice(col("cv"), 1, 16))
    val coarse = corpus.crossJoin(broadcast(qrow))
      .withColumn("coarse_cos", round(
        Similarity.dot(col("qv16"), col("cv16")) /
          (Similarity.norm(col("qv16")) * Similarity.norm(col("cv16"))), 3))
      .select(col("vec_id"), col("coarse_cos"), col("cv"), col("qv"))
    val cand = coarse
      .orderBy(col("coarse_cos").desc, col("vec_id").asc)
      .limit(100)
    cand
      .withColumn("full_cos", round(
        Similarity.dot(col("qv"), col("cv")) /
          (Similarity.norm(col("qv")) * Similarity.norm(col("cv"))), 3))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("full_cos").desc, col("vec_id").asc)))
      .where(col("rn") <= 10)
      .select(col("vec_id"), col("coarse_cos"), col("full_cos"),
        col("rn").cast("int").as("rn"))
  }

  /** E34 — out-of-order arrival audit: per user, how many events arrived
    * (by event_id, the ingest sequence) with an event time EARLIER than
    * one already seen, and the worst such regression. This distribution
    * IS the watermark-sizing input for every streaming aggregate in the
    * engine (`withWatermark(delay)` must cover max_late for exactly-once
    * window results — §2.9's 3–4-day ingestion lag is the reference
    * hard-coding this number instead of measuring it).
    *
    * All arithmetic on integer epoch-microseconds — engine-exact.
    *
    * Shape at scale: one window partitioned by user_id ordered by the
    * ingest sequence (running max of event time, exclusive frame), then a
    * partial-aggregable rollup — a single keyed shuffle end to end. */
  val e34OutOfOrder = q("e34_out_of_order",
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS t,
      |         max(epoch_us(ts::TIMESTAMP)) OVER (
      |           PARTITION BY user_id ORDER BY event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
      |  FROM events)
      |SELECT user_id,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(CASE WHEN t < seen THEN 1 END) AS BIGINT) AS n_late,
      |       CAST(coalesce(max(CASE WHEN t < seen THEN seen - t END), 0) AS BIGINT)
      |         AS max_late_us
      |FROM seq GROUP BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .withColumn("seen", max("t").over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("t") < col("seen"), 1)).as("n_late"),
        coalesce(max(when(col("t") < col("seen"), col("seen") - col("t"))),
          lit(0L)).as("max_late_us"))
  }

  /** SQL surface — the co-located warehouse star (h2's shape) as verbatim
    * `spark.sql` text with explicit BROADCAST hints: supplier, nation and
    * region ride the broadcast; the only shuffles are the two fact joins;
    * the c_nationkey = s_nationkey residual rides the supplier join. The
    * SQL-first user writes exactly this. */
  val sqlColocatedStar = q("sql_colocated_star",
    s"""SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_lines,
       |       ${rnd(rnd("sum(l.l_extendedprice * (1 - l.l_discount))", 4), 2)} AS revenue
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |                AND c.c_nationkey = s.s_nationkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = 'EUROPE'
       |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("wsql_c")
    Tables.orders(s, d).createOrReplaceTempView("wsql_o")
    Tables.lineitem(s, d).createOrReplaceTempView("wsql_l")
    Tables.supplier(s, d).createOrReplaceTempView("wsql_s")
    Tables.nation(s, d).createOrReplaceTempView("wsql_n")
    Tables.region(s, d).createOrReplaceTempView("wsql_r")
    s.sql(
      """SELECT /*+ BROADCAST(s), BROADCAST(n), BROADCAST(r) */
        |       n.n_name AS nation, count(*) AS n_lines,
        |       round(round(sum(l.l_extendedprice * (1 - l.l_discount)), 4), 2) AS revenue
        |FROM wsql_c c
        |JOIN wsql_o o ON c.c_custkey = o.o_custkey
        |JOIN wsql_l l ON l.l_orderkey = o.o_orderkey
        |JOIN wsql_s s ON l.l_suppkey = s.s_suppkey
        |                AND c.c_nationkey = s.s_nationkey
        |JOIN wsql_n n ON s.s_nationkey = n.n_nationkey
        |JOIN wsql_r r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'EUROPE'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n.n_name""".stripMargin)
  }

  val all: Seq[Q] = Seq(v16Matryoshka, e34OutOfOrder, sqlColocatedStar)
}
