package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.Tables

/** Round-3 widening, part 38: Z-order (Morton) curve clustering — the
  * multi-column data-skipping layout — as a pure Catalyst expression,
  * plus its skipping payoff pinned by ZOrderSpec.
  */
object Extended38 {

  /** Morton-interleave two 12-bit ints: bit i of `b` lands at position
    * 2i, bit i of `a` at 2i+1. Pure shift/and/or arithmetic — stays
    * inside whole-stage codegen (no UDF). */
  def zval(a: Column, b: Column): Column =
    (0 until 12).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i))
    }.reduce((x, y) => x.bitwiseOR(y))

  /** Morton-interleave N (2–4) bucket columns at `bits` bits each
    * (`bits * n <= 62` keeps the curve value a positive long): bit i of
    * column j lands at position `n*i + (n-1-j)`, so column order is
    * significance order within each bit plane — the exact N-column
    * generalization of [[zval]] (which stays the 12-bit 2-column form
    * the c10 oracle pins). Pure shift/and/or arithmetic, stays inside
    * whole-stage codegen. */
  def zvalN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2 && n <= 4, s"zvalN interleaves 2-4 columns; got $n")
    require(bits >= 1 && bits * n <= 62,
      s"$n x $bits-bit interleave overflows a positive long")
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(1), n * i + (n - 1 - j))
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as DuckDB SQL text (same op order). */
  def zvalSql(a: String, b: String): String =
    (0 until 12).map { i =>
      s"(((($a >> $i) & 1) << ${2 * i + 1}) | ((($b >> $i) & 1) << ${2 * i}))"
    }.mkString(" | ")

  /** C10 — Z-ORDER curve clustering: lineitem rows are mapped onto a
    * 24-bit Morton curve over (l_partkey, l_suppkey) and summarized per
    * curve block (zval >> 14). Because the curve interleaves bits, rows
    * close in BOTH key dimensions land in the same block — the property
    * that makes sorting by zval a multi-column data-skipping layout
    * (each file's zval min/max then bounds BOTH columns, so a filter on
    * either prunes files; ZOrderSpec measures the actual row-group
    * pruning on a zval-range-partitioned parquet write). The block
    * summary emits per-block row counts and the min/max of each raw
    * dimension, making the locality quantifiable and hash-checkable.
    *
    * Scale: the z-expression is per-row arithmetic inside codegen; the
    * layout cost is one range-partitioned sort at write time — after
    * which point/range queries on either key read a small fraction of
    * files instead of all of them. This is what lakehouse OPTIMIZE
    * ZORDER does; here it is a plain Column expression any write can
    * use. */
  val c10ZorderCurve = q("c10_zorder_curve",
    s"""WITH z AS (
       |  SELECT l_partkey % 4096 AS a, l_suppkey % 4096 AS b,
       |         ${zvalSql("(l_partkey % 4096)", "(l_suppkey % 4096)")} AS zv
       |  FROM lineitem)
       |SELECT zv // 16384 AS z_block,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(min(a) AS BIGINT) AS min_part, CAST(max(a) AS BIGINT) AS max_part,
       |       CAST(min(b) AS BIGINT) AS min_supp, CAST(max(b) AS BIGINT) AS max_supp
       |FROM z GROUP BY 1""".stripMargin) { (s, d) =>
    val a = (col("l_partkey") % 4096).cast("int")
    val b = (col("l_suppkey") % 4096).cast("int")
    Tables.lineitem(s, d)
      .select(a.as("a"), b.as("b"), zval(a, b).as("zv"))
      .groupBy((col("zv") / 16384).cast("long").as("z_block"))
      .agg(count(lit(1)).as("n_rows"),
        min("a").cast("long").as("min_part"), max("a").cast("long").as("max_part"),
        min("b").cast("long").as("min_supp"), max("b").cast("long").as("max_supp"))
  }

  val all: Seq[Q] = Seq(c10ZorderCurve)
}
