package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 6: conditional-expression family,
  * schema-evolution union, and RFM user segmentation.
  */
object Extended6 {

  /** F28 — conditional expression family: nullif / ifnull / greatest /
    * least / multi-way coalesce — the null-plumbing idioms the
    * reference's `int(x or 0)` guards (dataprocessing3.py:50-55) become
    * under a typed engine. All scan-side codegen. */
  val f28ConditionalFamily = q("f28_conditional_family",
    s"""SELECT c_custkey,
       |       ${rnd("nullif(c_acctbal, 0.0)", 2)} AS bal_nz,
       |       ${rnd("ifnull(nullif(c_acctbal, 0.0), -1.0)", 2)} AS bal_dflt,
       |       ${rnd("greatest(c_acctbal, 0.0)", 2)} AS bal_floor,
       |       ${rnd("least(c_acctbal, 1000.0)", 2)} AS bal_cap,
       |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_mapped
       |FROM customer""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_custkey"),
      round(nullif(col("c_acctbal"), lit(0.0)), 2).as("bal_nz"),
      round(coalesce(nullif(col("c_acctbal"), lit(0.0)), lit(-1.0)), 2).as("bal_dflt"),
      round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor"),
      round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
        .as("seg_mapped"))
  }

  /** U4 — schema-evolution union (unionByName with missing columns):
    * two extracts of the same entity with drifted schemas combined by
    * NAME, absent columns null-filled — the append path every long-lived
    * warehouse needs when v2 of a feed adds a column. */
  val u4SchemaEvolutionUnion = q("u4_schema_evolution_union",
    s"""SELECT o_orderkey, o_orderstatus, o_totalprice, NULL AS o_orderpriority
       |FROM orders WHERE o_orderkey % 5 = 0
       |UNION ALL BY NAME
       |SELECT o_orderkey, o_orderstatus, o_orderpriority,
       |       ${rnd("o_totalprice * 1.1", 2)} AS o_totalprice
       |FROM orders WHERE o_orderkey % 5 = 1""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val v1 = o.where(col("o_orderkey") % 5 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val v2 = o.where(col("o_orderkey") % 5 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        round(col("o_totalprice") * 1.1, 2).as("o_totalprice"))
    v1.unionByName(v2, allowMissingColumns = true)
  }

  /** G4 — RFM segmentation: each user scored by recency (last event),
    * frequency (event count), monetary (purchase value sum) terciles,
    * combined into the classic "R F M" segment code. Three metrics in
    * ONE aggregate pass, then three cheap ntile windows over the tiny
    * per-user table — the fact table is scanned exactly once. */
  val g4RfmSegmentation = q("g4_rfm_segmentation",
    """WITH m AS (
      |  SELECT user_id,
      |         max(epoch_us(ts::TIMESTAMP)) AS last_us,
      |         count(*) AS freq,
      |         coalesce(sum(value) FILTER (event_type = 'purchase'), 0.0) AS monetary
      |  FROM events GROUP BY 1),
      |scored AS (
      |  SELECT user_id,
      |         ntile(3) OVER (ORDER BY last_us DESC, user_id ASC) AS r,
      |         ntile(3) OVER (ORDER BY freq DESC, user_id ASC) AS f,
      |         ntile(3) OVER (ORDER BY monetary DESC, user_id ASC) AS mo
      |  FROM m)
      |SELECT user_id, CAST(r AS INT) AS r, CAST(f AS INT) AS f,
      |       CAST(mo AS INT) AS m,
      |       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(mo AS VARCHAR) AS segment
      |FROM scored""".stripMargin) { (s, d) =>
    val m = Tables.events(s, d).groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        coalesce(sum(when(col("event_type") === "purchase", col("value"))),
          lit(0.0)).as("monetary"))
    val r = ntile(3).over(Window.orderBy(col("last_us").desc, col("user_id").asc))
    val f = ntile(3).over(Window.orderBy(col("freq").desc, col("user_id").asc))
    val mo = ntile(3).over(Window.orderBy(col("monetary").desc, col("user_id").asc))
    m.select(col("user_id"), r.as("r"), f.as("f"), mo.as("m"))
      .select(col("user_id"), col("r"), col("f"), col("m"),
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")).as("segment"))
  }

  val all: Seq[Q] = Seq(f28ConditionalFamily, u4SchemaEvolutionUnion,
    g4RfmSegmentation)
}
