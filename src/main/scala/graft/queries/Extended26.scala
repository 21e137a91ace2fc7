package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 26: SQL-surface coverage — the parser/planner
  * capabilities a SQL-first user reaches for that the DataFrame battery
  * exercises only through the API: PIVOT syntax, LIMIT/OFFSET keyset-free
  * pagination, and correlated EXISTS subquery predicates.
  */
object Extended26 {

  /** SQL PIVOT syntax (e6 covers the DataFrame pivot API): quantity
    * totals spread over line status. Plans identically to the API form —
    * a single aggregation with a pivot projection, no extra pass. */
  val sqlPivot = q("sql_pivot",
    s"""SELECT l_returnflag,
       |       ${rnd("\"F\"", 2)} AS f_qty, ${rnd("\"O\"", 2)} AS o_qty
       |FROM (
       |  SELECT * FROM (SELECT l_returnflag, l_linestatus, l_quantity
       |                 FROM lineitem)
       |  PIVOT (sum(l_quantity) FOR l_linestatus IN ('F', 'O')))""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select("l_returnflag", "l_linestatus", "l_quantity")
      .createOrReplaceTempView("sql_pv_li")
    s.sql(
      """SELECT l_returnflag, round(F, 2) AS f_qty, round(O, 2) AS o_qty
        |FROM (SELECT * FROM sql_pv_li
        |      PIVOT (sum(l_quantity) FOR l_linestatus IN ('F', 'O')))""".stripMargin)
  }

  /** SQL LIMIT/OFFSET pagination over a total order (the ordering covers
    * every selected column, so page contents are a deterministic multiset
    * even where id pairs repeat). At scale OFFSET is a driver-side skip
    * after a global top-(offset+limit) — fine for page-sized offsets;
    * keyset pagination (WHERE key > last) is the deep-scroll path. */
  val sqlOffsetPagination = q("sql_offset_pagination",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice
      |LIMIT 25 OFFSET 50""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("sql_off_li")
    s.sql(
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM sql_off_li
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice
        |LIMIT 25 OFFSET 50""".stripMargin)
  }

  /** Correlated EXISTS subquery predicate in SQL (TPC-H Q4's true form —
    * h8 builds the semi join by hand; this lets the planner decorrelate).
    * Catalyst rewrites the EXISTS into a left-semi join on orderkey with
    * the quantity filter pushed into the subquery scan. */
  val sqlExistsSubquery = q("sql_exists_subquery",
    """SELECT o.o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("sql_ex_o")
    Tables.lineitem(s, d).createOrReplaceTempView("sql_ex_l")
    s.sql(
      """SELECT o.o_orderpriority, count(*) AS n_orders
        |FROM sql_ex_o o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM sql_ex_l l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |GROUP BY o.o_orderpriority""".stripMargin)
  }

  val all: Seq[Q] = Seq(sqlPivot, sqlOffsetPagination, sqlExistsSubquery)
}
