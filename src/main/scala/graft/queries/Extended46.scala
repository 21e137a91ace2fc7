package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 46: hybrid-retrieval rank fusion, integer-exact
  * audio resampling over real WAV decode, and referential-integrity
  * auditing.
  */
object Extended46 {

  /** V25 — reciprocal rank fusion (Cormack et al. SIGIR'09), the standard
    * hybrid-search combiner: a LEXICAL ranking (integer term-frequency
    * score for the fixed 3-term query, ties by id — integer ranks are
    * robustly cross-engine) and a SEMANTIC ranking (cosine against query
    * vector 42, v1's bit-identical array-sum discipline) each contribute
    * 1/(60+rank); docs in either top-20 fuse by the two-term sum (fixed
    * addition order ⇒ bit-identical doubles) and the top 10 survive.
    * This is the RAG retrieval pattern: BM25-class and ANN-class
    * rankings reconciled without score calibration.
    *
    * Shape at scale: each ranking is a top-k (TakeOrdered-class, never a
    * global sort materialization); the fusion joins two 20-row sets —
    * driver-negligible. Ranks, not scores, cross the fusion boundary,
    * which is the property that makes RRF distribution-free. */
  val v25RrfFusion = q("v25_rrf_fusion", {
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |lexs AS (
       |  SELECT doc_id,
       |         len(list_filter(t, x -> x = 'dup'))
       |       + len(list_filter(t, x -> x = 'vector'))
       |       + len(list_filter(t, x -> x = 'spark')) AS score
       |  FROM tok),
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       |  FROM lexs QUALIFY r <= 20),
       |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 42),
       |cos AS (
       |  SELECT e.vec_id,
       |         list_sum(list_transform(generate_series(1, 64),
       |           i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
       |                * CAST(qv.q[CAST(i AS INT)] AS DOUBLE)))
       |         / (sqrt(list_sum(list_transform(generate_series(1, 64),
       |              i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) ^ 2)))
       |          * sqrt(list_sum(list_transform(generate_series(1, 64),
       |              i -> CAST(qv.q[CAST(i AS INT)] AS DOUBLE) ^ 2)))) AS c
       |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 42),
       |sem AS (
       |  SELECT vec_id AS doc_id,
       |         row_number() OVER (ORDER BY c DESC, vec_id ASC) AS r
       |  FROM cos QUALIFY r <= 20),
       |fused AS (
       |  SELECT coalesce(l.doc_id, s.doc_id) AS id,
       |         l.r AS r_lex, s.r AS r_sem,
       |         coalesce(CAST(1 AS DOUBLE) / (60 + l.r), 0)
       |       + coalesce(CAST(1 AS DOUBLE) / (60 + s.r), 0) AS rrf
       |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
       |SELECT id, r_lex, r_sem, ${rnd("rrf", 6)} AS rrf,
       |       CAST(row_number() OVER (ORDER BY rrf DESC, id ASC) AS INT) AS rank
       |FROM fused QUALIFY rank <= 10""".stripMargin
  }) { (s, d) =>
    val toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")
    def cnt(term: String) = size(filter(col("t"), x => x === term))
    val lex = Tables.documents(s, d).select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        (cnt("dup") + cnt("vector") + cnt("spark")).as("score"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .where(col("r") <= 20).select("doc_id", "r")
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
    val qv = emb.where(col("vec_id") === 42).select(col("v").as("q"))
    def dot(a: Column, b: Column) = aggregate(
      zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, z) => acc + z)
    val sem = emb.where(col("vec_id") =!= 42).crossJoin(broadcast(qv))
      .select(col("vec_id"),
        (dot(col("v"), col("q")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("q"), col("q"))))).as("c"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("vec_id").asc)))
      .where(col("r") <= 20)
      .select(col("vec_id").as("doc_id"), col("r"))
    lex.as("l").join(sem.as("s"), col("l.doc_id") === col("s.doc_id"), "full_outer")
      .select(coalesce(col("l.doc_id"), col("s.doc_id")).as("id"),
        col("l.r").as("r_lex"), col("s.r").as("r_sem"),
        (coalesce(lit(1.0) / (lit(60) + col("l.r")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("s.r")), lit(0.0))).as("rrf0"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf0").desc, col("id").asc)))
      .where(col("rank") <= 10)
      .select(col("id"), col("r_lex"), col("r_sem"),
        round(col("rrf0"), 6).as("rrf"), col("rank").cast("int").as("rank"))
  }

  /** M15 — audio linear resampling (8 kHz → 5 kHz) over a REAL WAV
    * encode→decode round trip (m11's codec path): output sample j sits at
    * input position j·8/5, and the 8:5 rational ratio makes the
    * interpolation EXACT INTEGERS when scaled by 5 — out5[j] =
    * s[i]·(5−m) + s[i+1]·m with i = (8j) div 5, m = (8j) mod 5. The
    * oracle replays the closed-form byte pattern through the identical
    * index arithmetic, so header parsing, sample extraction, and every
    * interpolated value are hash-checked with zero float tolerance.
    *
    * Shape at scale: synth → encode → decode → resample runs scan-side
    * per partition (typed flatMap, m11's shape); only (doc, window) sums
    * leave the executor. */
  val m15AudioResample = q("m15_audio_resample",
    """WITH t AS (
      |  SELECT d.doc_id, 256 + d.doc_id % 64 AS n, s.j
      |  FROM documents d, generate_series(0, 319) s(j)
      |  WHERE s.j <= ((256 + d.doc_id % 64 - 2) * 5) // 8),
      |r AS (
      |  SELECT doc_id, CAST(((n - 2) * 5) // 8 + 1 AS BIGINT) AS out_len,
      |         j // 32 AS win,
      |         ((j * 8) // 5 * 13 + doc_id * 7) % 256 * (5 - (j * 8) % 5)
      |       + (((j * 8) // 5 + 1) * 13 + doc_id * 7) % 256 * ((j * 8) % 5) AS out5
      |  FROM t)
      |SELECT doc_id, out_len, CAST(win AS INT) AS win,
      |       CAST(sum(out5) AS BIGINT) AS w_sum5
      |FROM r GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .flatMap { id =>
        val n = (256 + id % 64).toInt
        val data = Array.tabulate[Byte](n)(t => ((t * 13 + id * 7) % 256).toByte)
        val wav = graft.multimodal.AudioOps.encodeWav8(data, sampleRate = 8000)
        val (_, samples) = graft.multimodal.AudioOps.decodeWav8(wav)
        val outLen = (n - 2) * 5 / 8 + 1
        (0 until outLen).map { j =>
          val pos = j * 8
          val i = pos / 5
          val m = pos % 5
          val out5 = samples(i).toLong * (5 - m) + samples(i + 1).toLong * m
          (id, outLen.toLong, j / 32, out5)
        }.groupBy { case (_, _, win, _) => win }.toSeq
          .map { case (win, ss) =>
            (id, outLen.toLong, win, ss.map(_._4).sum)
          }
      }
      .toDF("doc_id", "out_len", "win", "w_sum5")
  }

  /** C12 — referential-integrity audit (the dbt-test / data-contract
    * operator): for each FK edge of the star schema, the child row count,
    * orphan count (child keys with no parent), referenced-parent count,
    * and parent cardinality — one audit row per relationship. Orphan
    * detection is a left-anti join per edge; reference coverage is a
    * distinct-count. The synthetic generator emits no orphans, which is
    * exactly what the audit certifies (and the oracle independently
    * recomputes).
    *
    * Shape at scale: each edge is one anti-join + one distinct agg,
    * parent side build-hashed; edges are independent (union of 4
    * bounded aggregates). */
  val c12FkAudit = q("c12_fk_audit",
    """WITH e1 AS (
      |  SELECT 'lineitem.orderkey' AS fk,
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
      |         (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS n_referenced,
      |         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_parent),
      |e2 AS (
      |  SELECT 'lineitem.partkey',
      |         (SELECT count(*) FROM lineitem),
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
      |         (SELECT count(DISTINCT l_partkey) FROM lineitem),
      |         (SELECT count(*) FROM part)),
      |e3 AS (
      |  SELECT 'lineitem.suppkey',
      |         (SELECT count(*) FROM lineitem),
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
      |         (SELECT count(DISTINCT l_suppkey) FROM lineitem),
      |         (SELECT count(*) FROM supplier)),
      |e4 AS (
      |  SELECT 'orders.custkey',
      |         (SELECT count(*) FROM orders),
      |         (SELECT count(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |         (SELECT count(DISTINCT o_custkey) FROM orders),
      |         (SELECT count(*) FROM customer))
      |SELECT * FROM e1 UNION ALL SELECT * FROM e2
      |UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4""".stripMargin) { (s, d) =>
    def edge(fk: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val orphans = child.join(parent,
        child(key) === parent(pkey), "left_anti")
      child.agg(count(lit(1)).as("n_child"),
          countDistinct(col(key)).as("n_referenced"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .crossJoin(parent.agg(count(lit(1)).as("n_parent")))
        .select(lit(fk).as("fk"), col("n_child"), col("n_orphans"),
          col("n_referenced"), col("n_parent"))
    }
    val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
    edge("lineitem.orderkey", li, "l_orderkey", o, "o_orderkey")
      .unionByName(edge("lineitem.partkey", li, "l_partkey",
        Tables.part(s, d), "p_partkey"))
      .unionByName(edge("lineitem.suppkey", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"))
      .unionByName(edge("orders.custkey", o, "o_custkey",
        Tables.customer(s, d), "c_custkey"))
  }

  val all: Seq[Q] = Seq(v25RrfFusion, m15AudioResample, c12FkAudit)
}
