package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 41: residual IVF-ADC — the faithful IVFADC
  * read path (v22 is deliberately the non-residual variant).
  */
object Extended41 {

  /** V23 — RESIDUAL IVF-ADC (Jégou et al. TPAMI'11, the full design):
    * every vector is assigned to its nearest coarse cell, then PQ-encoded
    * on its RESIDUAL (v − centroid) — residuals concentrate near the
    * origin, so the same codebook budget quantizes them far better than
    * raw vectors (the reason production IVFADC is residual-based). The
    * query probes the 3 nearest cells and gets a PER-CELL LUT (its
    * residual differs per probed cell); candidates in those cells are
    * ranked by summed LUT lookups — no full-vector math per candidate.
    * Codewords are the residuals of 8 held-out trainer vectors per
    * 16-dim sub-block (a stand-in for k-means sub-codebooks; the
    * plan shape is identical). The DuckDB oracle replays the whole
    * path with structurally identical float expressions (same 64-fold
    * assignment sums, same 16-fold block sums, same tie-breaks), so
    * assignment, residual encoding, per-cell LUTs, and the final ADC
    * ranking are all hash-checked.
    *
    * Shape at scale: centroids, codebook, probe list, LUTs all
    * broadcast; residuals localCheckpoint once and feed codes + corpus
    * blocks without recomputation; the probe cut shrinks ADC work to
    * nprobe/ncells of the corpus. One keyed argmin per (vector, block)
    * — no candidate×candidate term anywhere. */
  val v23ResidualAdc = q("v23_residual_adc", {
    def sqSql(x: String, y: String, n: Int) =
      s"""list_sum(list_transform(generate_series(1, $n),
         |             i -> ($x[CAST(i AS INT)] - $y[CAST(i AS INT)]) ^ 2))""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id,
       |         list_transform(generate_series(1, 64),
       |                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS v
       |  FROM embeddings),
       |seeds AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id <= 10),
       |fd AS (
       |  SELECT e.vec_id, s.cid, ${sqSql("e.v", "s.c", 64)} AS fd
       |  FROM e CROSS JOIN seeds s),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY fd ASC, cid ASC) AS rn
       |    FROM fd) WHERE rn = 1),
       |resid AS (
       |  SELECT e.vec_id, cl.cell,
       |         list_transform(generate_series(1, 64),
       |                        i -> e.v[CAST(i AS INT)] - s.c[CAST(i AS INT)]) AS r
       |  FROM e JOIN cells cl ON e.vec_id = cl.vec_id
       |         JOIN seeds s ON cl.cell = s.cid
       |  WHERE e.vec_id <> 42),
       |w AS (
       |  SELECT vec_id AS j, CAST(u.b AS INT) AS b,
       |         list_slice(r, u.b * 16 + 1, u.b * 16 + 16) AS w
       |  FROM resid CROSS JOIN range(0, 4) u(b)
       |  WHERE vec_id BETWEEN 11 AND 18),
       |rb AS (
       |  SELECT vec_id, cell, CAST(u.b AS INT) AS b,
       |         list_slice(r, u.b * 16 + 1, u.b * 16 + 16) AS rb
       |  FROM resid CROSS JOIN range(0, 4) u(b)),
       |cd AS (
       |  SELECT vec_id, cell, b, j FROM (
       |    SELECT rb.vec_id, rb.cell, rb.b, w.j,
       |           row_number() OVER (PARTITION BY rb.vec_id, rb.b
       |             ORDER BY ${sqSql("rb.rb", "w.w", 16)} ASC, w.j ASC) AS rn
       |    FROM rb JOIN w ON rb.b = w.b) WHERE rn = 1),
       |probe AS (
       |  SELECT cid AS cell FROM fd WHERE vec_id = 42
       |  ORDER BY fd ASC, cid ASC LIMIT 3),
       |qr AS (
       |  SELECT p.cell,
       |         list_transform(generate_series(1, 64),
       |                        i -> e.v[CAST(i AS INT)] - s.c[CAST(i AS INT)]) AS r
       |  FROM e CROSS JOIN probe p JOIN seeds s ON s.cid = p.cell
       |  WHERE e.vec_id = 42),
       |lut AS (
       |  SELECT qr.cell, w.b, w.j,
       |         ${sqSql("list_slice(qr.r, w.b * 16 + 1, w.b * 16 + 16)", "w.w", 16)} AS dist
       |  FROM qr CROSS JOIN w),
       |adc AS (
       |  SELECT cd.vec_id,
       |         max(CASE WHEN cd.b = 0 THEN l.dist END) AS a0,
       |         max(CASE WHEN cd.b = 1 THEN l.dist END) AS a1,
       |         max(CASE WHEN cd.b = 2 THEN l.dist END) AS a2,
       |         max(CASE WHEN cd.b = 3 THEN l.dist END) AS a3
       |  FROM cd
       |  JOIN probe p ON cd.cell = p.cell
       |  JOIN lut l ON l.cell = cd.cell AND l.b = cd.b AND l.j = cd.j
       |  GROUP BY 1)
       |SELECT vec_id, ${rnd("a0 + a1 + a2 + a3", 4)} AS adc_dist
       |FROM adc
       |ORDER BY ${rnd("a0 + a1 + a2 + a3", 4)} ASC, vec_id ASC
       |LIMIT 10""".stripMargin
  }) { (s, d) =>
    def sq(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, z) => acc + z)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
    val seeds = emb.where(col("vec_id") <= 10)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    val fd = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cid"), sq(col("v"), col("c")).as("fd"))
      .localCheckpoint(true)
    val cells = fd.groupBy("vec_id")
      .agg(min(struct(col("fd"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    val resid = emb.where(col("vec_id") =!= 42)
      .join(cells, "vec_id")
      .join(broadcast(seeds.select(col("cid").as("cell"), col("c"))), "cell")
      .select(col("vec_id"), col("cell"),
        zip_with(col("v"), col("c"), (a, b) => a - b).as("r"))
      .localCheckpoint(true)
    def blocks(c: Column) = array((0 until 4).map(b => slice(c, b * 16 + 1, 16)): _*)
    val wCb = resid.where(col("vec_id").between(11, 18))
      .select(col("vec_id").as("j"), posexplode(blocks(col("r"))).as(Seq("b", "w")))
    val rbl = resid.select(col("vec_id"), col("cell"),
      posexplode(blocks(col("r"))).as(Seq("b", "rb")))
    val codes = rbl.join(broadcast(wCb), "b")
      .select(col("vec_id"), col("cell"), col("b"), col("j"),
        sq(col("rb"), col("w")).as("dist"))
      .groupBy("vec_id", "cell", "b")
      .agg(min(struct(col("dist"), col("j"))).as("m"))
      .select(col("vec_id"), col("cell"), col("b"), col("m.j").as("j"))
    val probe = fd.where(col("vec_id") === 42)
      .orderBy(col("fd").asc, col("cid").asc).limit(3)
      .select(col("cid").as("cell"))
    val qv = emb.where(col("vec_id") === 42).select(col("v").as("qv"))
    val qr = broadcast(probe)
      .join(broadcast(seeds.select(col("cid").as("cell"), col("c"))), "cell")
      .crossJoin(broadcast(qv))
      .select(col("cell"), zip_with(col("qv"), col("c"), (a, b) => a - b).as("r"))
    val lut = qr.crossJoin(broadcast(wCb))
      .select(col("cell"), col("b"), col("j"),
        sq(slice(col("r"), col("b") * 16 + 1, lit(16)), col("w")).as("dist"))
    val aggs = (0 until 4).map(b =>
      max(when(col("b") === b, col("dist"))).as(s"a$b"))
    codes.join(broadcast(probe), Seq("cell"))
      .join(broadcast(lut), Seq("cell", "b", "j"))
      .groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        round(col("a0") + col("a1") + col("a2") + col("a3"), 4).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(10)
  }

  val all: Seq[Q] = Seq(v23ResidualAdc)
}
