package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 53: entity resolution. */
object Extended53 {

  /** D21 — record linkage / entity resolution (Fellegi–Sunter shape):
    * blocking + field-wise agreement scoring + match classification —
    * the STRUCTURED-record twin of the text dedup family. The battery
    * plants its own ground truth: every 10th customer gets a perturbed
    * duplicate (one of the last two name chars dropped at a hash-chosen
    * position, balance nudged 50 cents, key offset +10⁷). Candidates
    * form only within a (nation, name-prefix-16) block; each pair
    * scores +2 for name edit-distance ≤1, +1 for balance within 1
    * dollar (exact-cents integers), classified match (≥3) / possible
    * (2). The audit reports, per class, pair counts and how many link
    * to the TRUE source — blocking recall and scoring precision in one
    * hash-checked table. Both engines share levenshtein semantics (t6
    * established parity).
    *
    * Shape at scale: the planted side is a scan-side projection; the
    * candidate join is block-keyed (never all-pairs — block size is
    * bounded by the prefix cardinality design, the operator's real-world
    * dial); scoring is per-pair scalar work. */
  val d21RecordLinkage = q("d21_record_linkage",
    """WITH cust AS (
      |  SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nat,
      |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      |  FROM customer),
      |planted AS (
      |  SELECT k + 10000000 AS k,
      |         substr(nm, 1, CAST(17 + ('0x' || substr(md5('rl:' || CAST(k AS VARCHAR)), 1, 4))::BIGINT % 2 - 1 AS INT))
      |         || substr(nm, CAST(17 + ('0x' || substr(md5('rl:' || CAST(k AS VARCHAR)), 1, 4))::BIGINT % 2 + 1 AS INT)) AS nm,
      |         nat, cents + 50 AS cents
      |  FROM cust WHERE k % 10 = 0),
      |cand AS (
      |  SELECT a.k AS ak, b.k AS bk,
      |         CASE WHEN levenshtein(a.nm, b.nm) <= 1 THEN 2 ELSE 0 END
      |       + CASE WHEN abs(a.cents - b.cents) <= 100 THEN 1 ELSE 0 END AS score
      |  FROM cust a JOIN planted b
      |    ON a.nat = b.nat AND substr(a.nm, 1, 16) = substr(b.nm, 1, 16)),
      |cls AS (
      |  SELECT CASE WHEN score >= 3 THEN 'match' ELSE 'possible' END AS cls,
      |         ak, bk
      |  FROM cand WHERE score >= 2)
      |SELECT cls, CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(sum(CASE WHEN bk - 10000000 = ak THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
      |       CAST(count(DISTINCT CASE WHEN bk - 10000000 = ak THEN bk END) AS BIGINT) AS planted_recovered
      |FROM cls GROUP BY 1""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).select(
      col("c_custkey").as("k"), col("c_name").as("nm"),
      col("c_nationkey").as("nat"),
      floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
    val pos = (graft.functions.HexPrefixLong(
      md5(concat(lit("rl:"), col("k").cast("string"))), 4) % 2 + 17).cast("int")
    val planted = cust.where(col("k") % 10 === 0)
      .withColumn("p", pos)
      .select((col("k") + 10000000L).as("k"),
        expr("concat(substring(nm, 1, p - 1), substring(nm, p + 1, 18))").as("nm"),
        col("nat"), (col("cents") + 50).as("cents"))
    val cand = cust.as("a").join(planted.as("b"),
        col("a.nat") === col("b.nat") &&
          substring(col("a.nm"), 1, 16) === substring(col("b.nm"), 1, 16))
      .select(col("a.k").as("ak"), col("b.k").as("bk"),
        (when(levenshtein(col("a.nm"), col("b.nm")) <= 1, 2).otherwise(0) +
          when(abs(col("a.cents") - col("b.cents")) <= 100, 1).otherwise(0)).as("score"))
    cand.where(col("score") >= 2)
      .select(when(col("score") >= 3, "match").otherwise("possible").as("cls"),
        col("ak"), col("bk"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("bk") - 10000000L === col("ak"), 1L).otherwise(0L)).as("n_true"),
        countDistinct(when(col("bk") - 10000000L === col("ak"), col("bk")))
          .as("planted_recovered"))
  }

  val all: Seq[Q] = Seq(d21RecordLinkage)
}
