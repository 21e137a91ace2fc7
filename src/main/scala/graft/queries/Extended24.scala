package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 24: array higher-order functions as a
  * first-class family, algebraic moment statistics, the full Gopher
  * quality gate, the BPE first-merge step, and channel-strided byte
  * statistics (the "decoded image plane" half of the multimodal path).
  *
  * All five are scan-local per row (f35/t27/t28/m6) or single-shuffle
  * partial aggregations (a23, t28's rollup) — nothing here moves payload
  * across the cluster beyond small aggregates.
  */
object Extended24 {

  /** F35 — array higher-order-function kitchen: filter, exists/forall
    * (as count-compare in the oracle), fold (aggregate), sort+slice, and
    * position — the lambda surface Catalyst codegens without UDFs. Every
    * column is array-local; the only pass over the corpus is the scan. */
  val f35ArrayHof = q("f35_array_hof",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |       CAST(len(list_filter(toks, x -> length(x) >= 5)) AS BIGINT) AS n_long,
      |       len(list_filter(toks, x -> length(x) > 8)) > 0 AS any_rare,
      |       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
      |         AS total_len,
      |       array_to_string(list_reverse_sort(toks)[1:3], ' ') AS top3,
      |       CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS the_pos
      |FROM t""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, d).select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(filter(col("toks"), x => length(x) >= 5)).cast("long").as("n_long"),
        exists(col("toks"), x => length(x) > 8).as("any_rare"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
          .as("total_len"),
        array_join(slice(sort_array(col("toks"), asc = false), 1, 3), " ")
          .as("top3"),
        array_position(col("toks"), "the").as("the_pos"))
  }

  /** A23 — algebraic moment statistics (mean, population variance,
    * skewness, excess kurtosis) per event type, formed from the four
    * power sums — the single-pass, partial-aggregable formulation (each
    * Σxᵏ map-side combines; the moments are arithmetic on one tiny row).
    * Both engines run the identical formula over identical sums, so the
    * doubles agree bit-for-bit before rounding. */
  val a23MomentStats = q("a23_moment_stats",
    s"""WITH p AS (
       |  SELECT event_type, count(*) AS n, sum(value) AS s1,
       |         sum(value * value) AS s2,
       |         sum(value * value * value) AS s3,
       |         sum(value * value * value * value) AS s4
       |  FROM events GROUP BY 1)
       |SELECT event_type, n,
       |       ${rnd("s1 / n", 6)} AS mean,
       |       ${rnd("s2 / n - (s1 / n) * (s1 / n)", 6)} AS var_pop,
       |       ${rnd("""(s3 / n - 3e0 * (s1 / n) * (s2 / n) + 2e0 * (s1 / n) * (s1 / n) * (s1 / n))
       |          / power(s2 / n - (s1 / n) * (s1 / n), 1.5e0)""".stripMargin.replace("\n", " "), 4)} AS skew,
       |       ${rnd("""(s4 / n - 4e0 * (s1 / n) * (s3 / n) + 6e0 * (s1 / n) * (s1 / n) * (s2 / n)
       |           - 3e0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
       |          / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3e0""".stripMargin.replace("\n", " "), 4)} AS kurt
       |FROM p""".stripMargin) { (s, d) =>
    val v = col("value")
    val p = Tables.events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
    val m = col("s1") / col("n")
    val m2 = col("s2") / col("n") - m * m
    val skew = (col("s3") / col("n") - lit(3.0) * m * (col("s2") / col("n")) +
      lit(2.0) * m * m * m) / pow(m2, 1.5)
    val kurt = (col("s4") / col("n") - lit(4.0) * m * (col("s3") / col("n")) +
      lit(6.0) * m * m * (col("s2") / col("n")) -
      lit(3.0) * m * m * m * m) / (m2 * m2) - lit(3.0)
    p.select(col("event_type"), col("n"), round(m, 6).as("mean"),
      round(m2, 6).as("var_pop"), round(skew, 4).as("skew"),
      round(kurt, 4).as("kurt"))
  }

  /** T27 — Gopher quality gate (Rae et al. '21 rule family adapted to
    * this corpus): word-count band, mean-word-length band, minimum
    * stopword hits; per-doc flags plus the conjunctive verdict. One scan,
    * all rules array-local — the screen every pretraining corpus runs
    * before any expensive pass. */
  val t27GopherGates = q("t27_gopher_gates",
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         CAST(len(toks) AS BIGINT) AS n_words,
       |         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |           / len(toks) AS mwl,
       |         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of',
       |           'to', 'in'))) AS BIGINT) AS n_stop
       |  FROM t)
       |SELECT doc_id, n_words, ${rnd("mwl", 4)} AS mean_word_len, n_stop,
       |       n_words BETWEEN 40 AND 100000 AS wc_ok,
       |       mwl BETWEEN 3e0 AND 10e0 AS mwl_ok,
       |       n_stop >= 2 AS stop_ok,
       |       (n_words BETWEEN 40 AND 100000) AND (mwl BETWEEN 3e0 AND 10e0)
       |         AND n_stop >= 2 AS passes
       |FROM m""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    val stopSet = Seq("the", "a", "and", "of", "to", "in")
    val m = Tables.documents(s, d).select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        (aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
          .cast("double") / size(col("toks"))).as("mwl"),
        size(filter(col("toks"), x => x.isin(stopSet: _*))).cast("long")
          .as("n_stop"))
    val wcOk = col("n_words").between(40L, 100000L)
    val mwlOk = col("mwl").between(3.0, 10.0)
    val stopOk = col("n_stop") >= 2
    m.select(col("doc_id"), col("n_words"), round(col("mwl"), 4)
        .as("mean_word_len"), col("n_stop"),
      wcOk.as("wc_ok"), mwlOk.as("mwl_ok"), stopOk.as("stop_ok"),
      (wcOk && mwlOk && stopOk).as("passes"))
  }

  /** T28 — BPE first-merge statistics: corpus-wide adjacent character-
    * pair counts over whitespace tokens (the argmax pair is the first
    * merge a byte-pair-encoding tokenizer would learn), top 20. Pair
    * generation is array-local per token; the only shuffle carries
    * (pair, partial count) — at 100 TB the exchanged rows are bounded by
    * the symbol-pair alphabet, not the corpus. */
  val t28BpePairs = q("t28_bpe_pairs",
    """WITH w AS (
      |  SELECT unnest(string_split(text, ' ')) AS wd FROM documents),
      |pairs AS (
      |  SELECT unnest(list_transform(range(1, length(wd)),
      |                i -> substring(wd, CAST(i AS INT), 2))) AS pair
      |  FROM w WHERE length(wd) >= 2)
      |SELECT pair, count(*) AS cnt
      |FROM pairs GROUP BY 1
      |ORDER BY cnt DESC, pair ASC
      |LIMIT 20""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("wd"))
      .where(length(col("wd")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(wd) - 1), i -> substring(wd, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)
  }

  /** M6 — channel-strided payload statistics: treating each document's
    * byte stream as interleaved 3-channel pixel data (RGBRGB…), per-
    * channel count / integer sum / max — the per-plane statistics an
    * image-ingest pipeline keeps after decode (m5 covers the whole-
    * payload checksum; this is the per-channel view). Exact integer
    * arithmetic, array-local, zero shuffle before the final projection. */
  val m6ChannelStats = q("m6_channel_stats",
    """WITH b AS (
      |  SELECT doc_id, list_transform(string_split(text, ''), x -> ord(x)) AS bytes
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id, c.c AS channel,
      |         list_filter(list_transform(range(1, len(bytes) + 1),
      |           i -> CASE WHEN (i - 1) % 3 = c.c
      |                     THEN bytes[CAST(i AS INT)] END),
      |           x -> x IS NOT NULL) AS chan
      |  FROM b CROSS JOIN (SELECT unnest(range(0, 3)) AS c) c)
      |SELECT doc_id, CAST(channel AS INT) AS channel,
      |       CAST(len(chan) AS BIGINT) AS n,
      |       CAST(list_sum(chan) AS BIGINT) AS byte_sum,
      |       CAST(list_max(chan) AS BIGINT) AS byte_max
      |FROM ch""".stripMargin) { (s, d) =>
    val chars = filter(split(col("text"), ""), c => c =!= "")
    val bytes = transform(chars, c => ascii(c))
    val b = Tables.documents(s, d)
      .select(col("doc_id"), bytes.as("bytes"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, 2), c -> struct(c AS channel,
          |  filter(transform(sequence(1, size(bytes)),
          |    i -> IF((i - 1) % 3 = c, bytes[i - 1], NULL)),
          |    x -> x IS NOT NULL) AS chan))""".stripMargin)).as("s"))
      .select(col("doc_id"), col("s.channel").as("channel"),
        col("s.chan").as("chan"))
    b.select(col("doc_id"), col("channel"),
      size(col("chan")).cast("long").as("n"),
      aggregate(col("chan"), lit(0L), (acc, x) => acc + x).as("byte_sum"),
      array_max(col("chan")).cast("long").as("byte_max"))
  }

  val all: Seq[Q] = Seq(f35ArrayHof, a23MomentStats, t27GopherGates,
    t28BpePairs, m6ChannelStats)
}
