package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 7: data-profiling statistics (chi-square
  * contingency), debounce/TTL dedup, per-group top-k, inter-event gap
  * stats, first-touch attribution, item co-visitation, validation
  * tagging, canonical row hashing, and share-of-total reporting.
  */
object Extended7 {

  /** A17 — chi-square contingency analysis (lang × source): observed vs
    * expected under independence, with the per-cell χ² term — the
    * categorical-drift screen of corpus profiling. One grouped count of
    * the fact; margins and the grand total are tiny re-aggregations of
    * the cell table, joined back broadcast. */
  val a17ChiSquare = q("a17_chi_square",
    s"""WITH o AS (SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
       |r AS (SELECT lang, sum(obs) AS rt FROM o GROUP BY 1),
       |c AS (SELECT source, sum(obs) AS ct FROM o GROUP BY 1),
       |n AS (SELECT sum(obs) AS n FROM o)
       |SELECT o.lang, o.source, CAST(o.obs AS BIGINT) AS obs,
       |       ${rnd("r.rt * c.ct / n.n", 4)} AS expected,
       |       ${rnd("pow(o.obs - r.rt * c.ct / n.n, 2) / (r.rt * c.ct / n.n)", 4)} AS chi2_term
       |FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n""".stripMargin) { (s, d) =>
    val o = Tables.documents(s, d).groupBy("lang", "source")
      .agg(count(lit(1)).as("obs"))
    val r = o.groupBy("lang").agg(sum("obs").as("rt"))
    val c = o.groupBy("source").agg(sum("obs").as("ct"))
    val n = o.agg(sum("obs").as("n"))
    val exp = col("rt") * col("ct") / col("n")
    o.join(broadcast(r), "lang").join(broadcast(c), "source")
      .crossJoin(broadcast(n))
      .select(col("lang"), col("source"), col("obs"),
        round(exp, 4).as("expected"),
        round(pow(col("obs") - exp, 2) / exp, 4).as("chi2_term"))
  }

  /** W10 — debounce dedup: drop an event when the immediately preceding
    * event of the same (user, type) is closer than 600 s — the TTL-style
    * suppression sensor/telemetry feeds need. One lag window per key;
    * state at scale is a single timestamp per key, and the same shape
    * runs streaming under `flatMapGroupsWithState`. */
  val w10DebounceDedup = q("w10_debounce_dedup",
    """WITH x AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS us,
      |         lag(epoch_us(ts::TIMESTAMP)) OVER (
      |           PARTITION BY user_id, event_type
      |           ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS prev_us
      |  FROM events)
      |SELECT event_id, user_id, event_type
      |FROM x WHERE prev_us IS NULL OR us - prev_us >= 600000000""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .where(col("prev_us").isNull || col("us") - col("prev_us") >= 600000000L)
      .select("event_id", "user_id", "event_type")
  }

  /** W11 — top-k per group (3 biggest orders per customer): the grouped
    * cousin of w4's global top-k. One shuffle on the group key; rank
    * truncation happens inside the window, so no group ever materializes
    * beyond its partition. */
  val w11TopkPerGroup = q("w11_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         CAST(row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
      |  FROM orders) WHERE rk <= 3""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("int").as("rk"))
      .where(col("rk") <= 3)
  }

  /** E22 — inter-event gap statistics: lead-difference per user, then
    * avg/median/max gap grouped by the earlier event's type — the
    * arrival-process profile (think hazard analysis) of behavioral data.
    * One window shuffle on user, one agg; the median swaps for a sketch
    * at 100 TB without changing the plan shape. */
  val e22InterEventGaps = q("e22_inter_event_gaps",
    s"""WITH g AS (
       |  SELECT event_type, epoch_us(ts::TIMESTAMP) AS us,
       |         lead(epoch_us(ts::TIMESTAMP)) OVER (
       |           PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS nxt
       |  FROM events)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       |       ${rnd("avg((nxt - us) / 1000000.0)", 4)} AS avg_gap_s,
       |       ${rnd("quantile_cont((nxt - us) / 1000000.0, 0.5)", 4)} AS med_gap_s,
       |       ${rnd("max((nxt - us) / 1000000.0)", 4)} AS max_gap_s
       |FROM g WHERE nxt IS NOT NULL GROUP BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gap = (col("nxt") - col("us")) / 1000000.0
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("nxt", lead("us", 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(gap), 4).as("avg_gap_s"),
        round(expr("percentile((nxt - us) / 1000000.0, 0.5D)"), 4).as("med_gap_s"),
        round(max(gap), 4).as("max_gap_s"))
  }

  /** G5 — first-touch attribution: each user's acquisition channel is the
    * props.k bucket of their FIRST event; purchase value rolls up to that
    * channel. The first-event pick is a row_number window (one shuffle on
    * user); the per-user purchase rollup is partial-aggregable; the final
    * channel rollup is tiny. */
  val g5FirstTouch = q("g5_first_touch",
    s"""WITH f AS (
       |  SELECT user_id,
       |         CAST(json_extract_string(props, '$$.k') AS INT) % 10 AS channel
       |  FROM (SELECT user_id, props, row_number() OVER (
       |          PARTITION BY user_id
       |          ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS rn FROM events)
       |  WHERE rn = 1),
       |p AS (SELECT user_id, count(*) AS n_purch, sum(value) AS v
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
       |SELECT f.channel, CAST(count(*) AS BIGINT) AS n_users,
       |       CAST(coalesce(sum(p.n_purch), 0) AS BIGINT) AS n_purchases,
       |       ${rnd("coalesce(sum(p.v), 0)", 2)} AS attributed_value
       |FROM f LEFT JOIN p USING (user_id) GROUP BY 1""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val f = e.select(col("user_id"), col("props"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("channel"))
    val p = e.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purch"), sum("value").as("v"))
    f.join(p, Seq("user_id"), "left")
      .groupBy("channel")
      .agg(count(lit(1)).as("n_users"),
        coalesce(sum("n_purch"), lit(0L)).as("n_purchases"),
        round(coalesce(sum("v"), lit(0.0)), 2).as("attributed_value"))
  }

  /** G6 — item co-visitation counts (the item-item co-occurrence matrix
    * recommender training starts from): distinct (user, item), then pairs
    * generated ARRAY-LOCALLY from each user's sorted item set — bounded
    * by items-per-user, never a positional self-join of the fact. The
    * oracle states the same thing with a self-join, which is the shape
    * we deliberately avoid at scale. */
  val g6Covisitation = q("g6_covisitation",
    """WITH it AS (
      |  SELECT DISTINCT user_id,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS item
      |  FROM events)
      |SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS n
      |FROM it a JOIN it b ON a.user_id = b.user_id AND a.item < b.item
      |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .distinct()
      .groupBy("user_id").agg(sort_array(collect_set(col("item"))).as("a"))
      .select(explode(expr(
        "flatten(transform(a, (x, i) -> transform(slice(a, i + 2, size(a)), " +
          "y -> named_struct('i1', x, 'i2', y))))")).as("p"))
      .groupBy(col("p.i1").as("i1"), col("p.i2").as("i2"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 3)
  }

  /** F31 — validation tagging (dead-letter routing without the detour):
    * every order gets the comma-joined list of rule tags it trips plus a
    * flag — the split into clean/quarantine streams is then a pushdown
    * filter on `is_flagged`. Pure scan-side expression work. */
  val f31ValidationTags = q("f31_validation_tags",
    """SELECT o_orderkey,
      |       concat_ws(',',
      |         CASE WHEN o_totalprice > 300000 THEN 'extreme_price' END,
      |         CASE WHEN o_orderpriority LIKE '1-%' THEN 'urgent' END,
      |         CASE WHEN o_orderstatus = 'F' AND o_totalprice < 5000 THEN 'tiny_final' END)
      |         AS tags,
      |       CAST((CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
      |          + (CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END)
      |          + (CASE WHEN o_orderstatus = 'F' AND o_totalprice < 5000 THEN 1 ELSE 0 END)
      |          AS INT) AS n_tags,
      |       (CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END)
      |          + (CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END)
      |          + (CASE WHEN o_orderstatus = 'F' AND o_totalprice < 5000 THEN 1 ELSE 0 END)
      |          > 0 AS is_flagged
      |FROM orders""".stripMargin) { (s, d) =>
    val extreme = when(col("o_totalprice") > 300000, lit("extreme_price"))
    val urgent = when(col("o_orderpriority").like("1-%"), lit("urgent"))
    val tiny = when(col("o_orderstatus") === "F" && col("o_totalprice") < 5000,
      lit("tiny_final"))
    val nTags = (when(col("o_totalprice") > 300000, 1).otherwise(0)
      + when(col("o_orderpriority").like("1-%"), 1).otherwise(0)
      + when(col("o_orderstatus") === "F" && col("o_totalprice") < 5000, 1)
        .otherwise(0))
    Tables.orders(s, d).select(col("o_orderkey"),
      concat_ws(",", extreme, urgent, tiny).as("tags"),
      nTags.cast("int").as("n_tags"), (nTags > 0).as("is_flagged"))
  }

  /** F32 — canonical row fingerprint: md5 over a '|'-joined canonical
    * serialization (doubles pinned through DECIMAL(12,2) so the text form
    * is engine-independent) — the change-detection checksum snapshot
    * diffing (j7) keys on. Scan-side, codegen'd, zero shuffles. */
  val f32RowHash = q("f32_row_hash",
    """SELECT c_custkey,
      |       md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name,
      |           CAST(c_nationkey AS VARCHAR),
      |           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR),
      |           c_mktsegment)) AS row_md5
      |FROM customer""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_custkey"),
      md5(concat_ws("|", col("c_custkey").cast("string"), col("c_name"),
        col("c_nationkey").cast("string"),
        col("c_acctbal").cast("decimal(12,2)").cast("string"),
        col("c_mktsegment"))).as("row_md5"))
  }

  /** W12 — share-of-total + running contribution per customer: each
    * order's fraction of its customer's spend and the cumulative share in
    * descending-price order (the Pareto curve per key). The denominator
    * comes from a grouped sum joined back — not an unordered window — so
    * the FP summation order is the aggregate's, same as the oracle's. */
  val w12ShareOfTotal = q("w12_share_of_total",
    s"""WITH t AS (SELECT o_custkey, sum(o_totalprice) AS tot FROM orders GROUP BY 1)
       |SELECT o_orderkey, o_custkey,
       |       ${rnd("o_totalprice / tot", 6)} AS share,
       |       ${rnd("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ROWS UNBOUNDED PRECEDING) / tot", 6)} AS cum_share
       |FROM orders JOIN t USING (o_custkey)""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val t = o.groupBy("o_custkey").agg(sum("o_totalprice").as("tot"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.join(t, "o_custkey")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") / col("tot"), 6).as("share"),
        round(sum("o_totalprice").over(w) / col("tot"), 6).as("cum_share"))
  }

  /** D10 — train/test distribution-drift screen: length-histogram shares
    * of the two hash-split halves compared bin-by-bin (the KS-style check
    * run before accepting a split). One grouped count with conditional
    * aggregation + a broadcast 1-row total — two tiny shuffles. */
  val d10SplitDrift = q("d10_split_drift",
    s"""WITH s AS (
       |  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
       |              THEN 'train' ELSE 'test' END AS split,
       |         n_chars // 100 AS bin
       |  FROM documents),
       |c AS (SELECT bin, count(*) FILTER (split = 'train') AS ntr,
       |             count(*) FILTER (split = 'test') AS nte
       |      FROM s GROUP BY 1),
       |t AS (SELECT sum(ntr) AS ttr, sum(nte) AS tte FROM c)
       |SELECT bin, CAST(ntr AS BIGINT) AS ntr, CAST(nte AS BIGINT) AS nte,
       |       ${rnd("ntr / ttr", 6)} AS train_share,
       |       ${rnd("nte / tte", 6)} AS test_share,
       |       ${rnd("abs(ntr / ttr - nte / tte)", 6)} AS drift
       |FROM c CROSS JOIN t""".stripMargin) { (s, d) =>
    val split = when(substring(md5(col("doc_id").cast("string")), 1, 1) < "8",
      "train").otherwise("test")
    val c = Tables.documents(s, d)
      .select(split.as("split"), expr("n_chars div 100").as("bin"))
      .groupBy("bin")
      .agg(count(when(col("split") === "train", 1)).as("ntr"),
        count(when(col("split") === "test", 1)).as("nte"))
    val t = c.agg(sum("ntr").as("ttr"), sum("nte").as("tte"))
    c.crossJoin(broadcast(t))
      .select(col("bin"), col("ntr"), col("nte"),
        round(col("ntr") / col("ttr"), 6).as("train_share"),
        round(col("nte") / col("tte"), 6).as("test_share"),
        round(abs(col("ntr") / col("ttr") - col("nte") / col("tte")), 6)
          .as("drift"))
  }

  /** F33 — text normalization pipeline: lowercase → trim → strip
    * non-alphanumerics → collapse runs of whitespace → slug. The
    * canonicalization pass that precedes exact dedup (d1 hashes THIS,
    * not raw text, in production). Pure codegen'd scan work. */
  val f33TextNormalize = q("f33_text_normalize",
    """SELECT doc_id,
      |       regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
      |                      ' +', ' ', 'g') AS norm,
      |       replace(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
      |                              ' +', ' ', 'g'), ' ', '-') AS slug,
      |       CAST(length(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
      |                                  ' +', ' ', 'g')) AS INT) AS n_chars_norm
      |FROM documents""".stripMargin) { (s, d) =>
    val norm = regexp_replace(
      regexp_replace(lower(trim(col("text"))), "[^a-z0-9 ]", ""), " +", " ")
    Tables.documents(s, d).select(col("doc_id"), norm.as("norm"),
      regexp_replace(norm, " ", "-").as("slug"),
      length(norm).cast("int").as("n_chars_norm"))
  }

  /** P9 — cluster (block) sampling: keep ALL events of a deterministic
    * 25% of users — when rows within a key are correlated, row sampling
    * (t5/p6) biases per-key statistics; key sampling preserves them.
    * Scan-side hash filter, no shuffle, pushdown-friendly. */
  val p9UserClusterSample = q("p9_user_cluster_sample",
    """SELECT event_id, user_id, event_type FROM events
      |WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '4'""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .where(substring(md5(col("user_id").cast("string")), 1, 1) < "4")
      .select("event_id", "user_id", "event_type")
  }

  /** V10 — partition label-noise report: bucket vectors into sign-bit
    * cells, take each cell's majority label (deterministic tie-break),
    * and report the disagreement rate — the "is this cluster coherent"
    * screen run over candidate training labels. Cell stats are tiny;
    * everything partial-aggregates. */
  val v10CellLabelNoise = q("v10_cell_label_noise",
    s"""WITH v AS (
       |  SELECT vec_id, label,
       |         (CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 2 ELSE 0 END
       |        + CASE WHEN CAST(embedding[2] AS DOUBLE) > 0 THEN 1 ELSE 0 END) AS cell
       |  FROM embeddings),
       |c AS (SELECT cell, label, count(*) AS n FROM v GROUP BY 1, 2),
       |t AS (SELECT cell, sum(n) AS tot FROM c GROUP BY 1),
       |m AS (SELECT cell, label AS maj_label, n AS maj_n FROM (
       |        SELECT cell, label, n, row_number() OVER (
       |          PARTITION BY cell ORDER BY n DESC, label) AS rk FROM c)
       |      WHERE rk = 1)
       |SELECT CAST(m.cell AS INT) AS cell, CAST(m.maj_label AS INT) AS maj_label,
       |       CAST(t.tot AS BIGINT) AS n_vecs,
       |       ${rnd("1 - m.maj_n / t.tot", 6)} AS noise_rate
       |FROM m JOIN t USING (cell)""".stripMargin) { (s, d) =>
    val cell = (when(element_at(col("embedding"), 1).cast("double") > 0, 2)
      .otherwise(0)
      + when(element_at(col("embedding"), 2).cast("double") > 0, 1).otherwise(0))
    val c = Tables.embeddings(s, d).select(cell.as("cell"), col("label"))
      .groupBy("cell", "label").agg(count(lit(1)).as("n"))
    val t = c.groupBy("cell").agg(sum("n").as("tot"))
    val m = c.withColumn("rk", row_number().over(
        Window.partitionBy("cell").orderBy(col("n").desc, col("label"))))
      .where(col("rk") === 1)
      .select(col("cell"), col("label").as("maj_label"), col("n").as("maj_n"))
    m.join(t, "cell")
      .select(col("cell").cast("int").as("cell"),
        col("maj_label").cast("int").as("maj_label"),
        col("tot").as("n_vecs"),
        round(lit(1) - col("maj_n") / col("tot"), 6).as("noise_rate"))
  }

  /** E25 — time-since-marker: seconds since the user's last PRIOR
    * purchase at every event (running max over a marker timestamp,
    * exclusive frame) — the recency feature and "events since
    * conversion" segmentation in one window. One shuffle on user. */
  val e25SinceMarker = q("e25_since_marker",
    s"""WITH x AS (
       |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS us,
       |         max(CASE WHEN event_type = 'purchase'
       |                  THEN epoch_us(ts::TIMESTAMP) END) OVER (
       |           PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mark_us
       |  FROM events)
       |SELECT event_id, user_id,
       |       ${rnd("(us - mark_us) / 1000000.0", 4)} AS since_s,
       |       mark_us IS NOT NULL AS had_prior_purchase
       |FROM x""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("mark_us",
        max(when(col("event_type") === "purchase", col("us"))).over(w))
      .select(col("event_id"), col("user_id"),
        round((col("us") - col("mark_us")) / 1000000.0, 4).as("since_s"),
        col("mark_us").isNotNull.as("had_prior_purchase"))
  }

  val all: Seq[Q] = Seq(a17ChiSquare, w10DebounceDedup, w11TopkPerGroup,
    e22InterEventGaps, g5FirstTouch, g6Covisitation, f31ValidationTags,
    f32RowHash, w12ShareOfTotal, d10SplitDrift, f33TextNormalize,
    p9UserClusterSample, v10CellLabelNoise, e25SinceMarker)
}
