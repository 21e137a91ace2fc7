package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 52: overlap-tiled image processing and
  * experiment evaluation.
  */
object Extended52 {

  /** M16 — overlap-tiled transform + blend reassembly (the SAHI /
    * sliding-window inference pattern): a REAL decoded 16×16 PNG (m9's
    * codec path) splits into four 10×10 tiles at stride 6, each tile
    * applies its transform (here +tileId on the red channel — the
    * stand-in for per-tile model output), and reassembly SUMS
    * contributions per pixel alongside a coverage count (overlap pixels
    * get 2 or 4 contributions — the blend denominator). The per-doc
    * checksum folds contribution and coverage so a single misplaced
    * tile boundary breaks the hash. All-integer arithmetic.
    *
    * Shape at scale: decode → tile → blend runs scan-side per partition
    * (typed mapPartitions, m9's shape); only (doc, checksum) rows leave
    * the executor — the exact shape of production tiled inference where
    * the model runs next to the pixels. */
  val m16TileBlend = q("m16_tile_blend",
    """WITH px AS (
      |  SELECT d.doc_id, x.x, y.y,
      |         (x.x * 7 + y.y * 13 + d.doc_id) % 256 AS r
      |  FROM documents d, generate_series(0, 15) x(x), generate_series(0, 15) y(y)),
      |cov AS (
      |  SELECT doc_id, x, y, r,
      |         CAST(sum(CASE WHEN x >= tx.t * 6 AND x < tx.t * 6 + 10
      |                        AND y >= ty.t * 6 AND y < ty.t * 6 + 10
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS coverage,
      |         CAST(sum(CASE WHEN x >= tx.t * 6 AND x < tx.t * 6 + 10
      |                        AND y >= ty.t * 6 AND y < ty.t * 6 + 10
      |                  THEN r + tx.t * 2 + ty.t ELSE 0 END) AS BIGINT) AS contrib
      |  FROM px, generate_series(0, 1) tx(t), generate_series(0, 1) ty(t)
      |  GROUP BY 1, 2, 3, 4)
      |SELECT doc_id,
      |       CAST(sum(CASE WHEN coverage > 1 THEN 1 ELSE 0 END) AS BIGINT) AS overlap_px,
      |       CAST(sum(contrib * 31 + coverage) AS BIGINT) AS checksum
      |FROM cov GROUP BY 1""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.multimodal.BinaryOps
    docIds(s, d) // single-row-group input: repartition or the codec loop below runs serial
      .mapPartitions { ids =>
        ids.map { id =>
          val png = BinaryOps.encodePng(16, 16, (x, y) =>
            ((((x * 7 + y * 13 + id) % 256).toInt << 16) |
              (((x * 3 + y * 5 + 2 * id) % 256).toInt << 8) |
              ((x + y + 3 * id) % 256).toInt))
          val img = BinaryOps.readImage(png)
          require(img != null, s"PNG for doc $id failed to decode")
          var overlapPx = 0L; var checksum = 0L
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val r = (img.getRGB(x, y) >> 16) & 0xFF
              var coverage = 0L; var contrib = 0L
              var ty = 0
              while (ty < 2) {
                var tx = 0
                while (tx < 2) {
                  if (x >= tx * 6 && x < tx * 6 + 10 &&
                      y >= ty * 6 && y < ty * 6 + 10) {
                    coverage += 1; contrib += r + tx * 2 + ty
                  }
                  tx += 1
                }
                ty += 1
              }
              if (coverage > 1) overlapPx += 1
              checksum += contrib * 31 + coverage
              x += 1
            }
            y += 1
          }
          (id, overlapPx, checksum)
        }
      }
      .toDF("doc_id", "overlap_px", "checksum")
  }

  /** E47 — two-proportion z-test (A/B experiment evaluation): users
    * split by id parity into control/treatment; "converted" = had ≥1
    * high-value purchase (value > 200 — mid-rate, so neither arm is
    * degenerate). The pooled two-proportion z-statistic
    * (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁)) and its |z|>1.96 verdict are the
    * product-analytics significance readout (a17's chi-square is the
    * k×k generalization; this is the one-dial two-arm form every
    * experimentation platform ships). All inputs are exact integers;
    * the statistic is a short fixed chain of IEEE ops — identical in
    * both engines — with the guard rounding on top.
    *
    * Shape at scale: one per-user conversion agg (map-side combined),
    * then a 2-row arm rollup — the z arithmetic is driver-negligible
    * scalar algebra on broadcast-sized state. */
  val e47AbZtest = q("e47_ab_ztest",
    s"""WITH u AS (
       |  SELECT user_id, user_id % 2 AS arm,
       |         max(CASE WHEN event_type = 'purchase' AND value > 200 THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY 1, 2),
       |arms AS (
       |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(conv) AS BIGINT) AS c
       |  FROM u GROUP BY 1),
       |w AS (
       |  SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
       |         max(CASE WHEN arm = 0 THEN c END) AS c0,
       |         max(CASE WHEN arm = 1 THEN n END) AS n1,
       |         max(CASE WHEN arm = 1 THEN c END) AS c1
       |  FROM arms),
       |z AS (
       |  SELECT n0, c0, n1, c1,
       |         (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
       |         / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
       |                * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
       |                * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)) AS zs
       |  FROM w)
       |SELECT n0, c0, n1, c1, ${rnd("zs", 6)} AS z,
       |       abs(zs) > 1.96 AS significant
       |FROM z""".stripMargin) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 200, 1).otherwise(0)).as("conv"))
    val arms = u.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("conv").cast("long").as("c"))
    val w = arms.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("c"))).as("c0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("c"))).as("c1"))
    val pHat = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    val zs = (col("c1").cast("double") / col("n1") -
        col("c0").cast("double") / col("n0")) /
      sqrt(pHat * (lit(1) - pHat) *
        (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    w.select(col("n0"), col("c0"), col("n1"), col("c1"),
      round(zs, 6).as("z"), (abs(zs) > 1.96).as("significant"))
  }

  val all: Seq[Q] = Seq(m16TileBlend, e47AbZtest)
}
