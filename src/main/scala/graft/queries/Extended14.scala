package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.NearDup

/** Round-2 widening, part 14: containment-style near-dup verification and
  * per-document keyphrase extraction.
  */
object Extended14 {

  private val shCte =
    """tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |              ELSE list_transform(generate_series(1, len(t) - 2),
      |                                  i -> array_to_string(t[i:i+2], ' ')) END AS shingles
      |  FROM tok)""".stripMargin

  /** D17 — containment (overlap-coefficient) verification on the LSH
    * candidates: |A∩B| / min(|A|,|B|) over distinct 3-shingles. Symmetric
    * Jaccard (d5) misses the doc-inside-doc case — a short document fully
    * quoted inside a long one scores low Jaccard but overlap 1.0 — and
    * containment is the signal quote/subset dedup (and the contamination
    * screen d9) actually wants. Emitted with both set sizes so the caller
    * can recover directed containment (which side is the subset).
    *
    * Shape at scale: identical to d5's verification join — shingle sets
    * built ONLY for pair members (semi join), intersection computed
    * array-locally per pair; cost tracks the candidate count, never
    * corpus². */
  val d17Containment = q("d17_containment",
    s"""WITH $shCte,
       |sigs AS (
       |  SELECT doc_id, u.band,
       |         md5(list_min(list_transform(shingles, s -> md5(u.band || ':' || s)))) AS h
       |  FROM sh CROSS JOIN range(0, 8) u(band)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
       |  WHERE a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct(shingles) AS shset FROM sh)
       |SELECT c.id_a, c.id_b,
       |       CAST(len(list_distinct(list_intersect(a.shset, b.shset))) AS BIGINT) AS inter,
       |       CAST(len(a.shset) AS BIGINT) AS size_a,
       |       CAST(len(b.shset) AS BIGINT) AS size_b,
       |       ${rnd("CAST(len(list_distinct(list_intersect(a.shset, b.shset))) AS DOUBLE) / least(len(a.shset), len(b.shset))", 4)} AS overlap
       |FROM cand c
       |JOIN sets a ON c.id_a = a.doc_id
       |JOIN sets b ON c.id_b = b.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val pairs = NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
      .select("id_a", "id_b").localCheckpoint(true)
    val members = pairs.select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    val sets = docs.join(members, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        array_distinct(NearDup.shingles(col("text"), 3)).as("shset"))
    pairs
      .join(sets.select(col("doc_id").as("id_a"), col("shset").as("sa")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("shset").as("sb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .select(col("id_a"), col("id_b"), col("inter"),
        size(col("sa")).cast("long").as("size_a"),
        size(col("sb")).cast("long").as("size_b"),
        round(col("inter").cast("double") /
          least(size(col("sa")), size(col("sb"))), 4).as("overlap"))
  }

  /** T23 — keyphrase extraction: each document's top-3 tokens by TF-IDF
    * (t15's exact weighting), tie-broken lexicographically — the
    * compressed topical label a corpus browser / cluster-naming pass
    * attaches to every document.
    *
    * Shape at scale: t15's three partial-aggregable passes, then ONE
    * doc_id-partitioned window for the top-k truncation (w11's shape) and
    * an ordered array collect; the document-frequency join broadcasts the
    * vocabulary-sized side. Ordering by the raw double is safe
    * cross-engine because the tfidf expression is evaluated identically
    * (fixed operation order on exact integer counts). */
  val t23Keyphrases = q("t23_keyphrases",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |tf AS (SELECT doc_id, len(t) AS dlen, unnest(t) AS token FROM tok),
      |c AS (SELECT doc_id, token, any_value(dlen) AS dlen, count(*) AS tf
      |      FROM tf GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM c GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT c.doc_id, c.token, (c.tf / c.dlen) * ln(n.n / df.df) AS tfidf,
      |         row_number() OVER (PARTITION BY c.doc_id
      |                            ORDER BY (c.tf / c.dlen) * ln(n.n / df.df) DESC,
      |                                     c.token ASC) AS rn
      |  FROM c JOIN df ON c.token = df.token CROSS JOIN n)
      |SELECT doc_id,
      |       string_agg(token, ',' ORDER BY rn) AS keyphrases,
      |       CAST(round(CAST(CAST(max(CASE WHEN rn = 1 THEN tfidf END) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS top_tfidf
      |FROM scored WHERE rn <= 3 GROUP BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val c = docs.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"), size(col("t")).as("dlen"), explode(col("t")).as("token"))
      .groupBy("doc_id", "token")
      .agg(first("dlen").as("dlen"), count(lit(1)).as("tf"))
    val dfreq = c.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = c.join(broadcast(dfreq), "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        ((col("tf") / col("dlen")) * log(col("n") / col("df"))).as("tfidf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .groupBy("doc_id")
      .agg(concat_ws(",", transform(
          sort_array(collect_list(struct(col("rn"), col("token")))),
          kv => kv.getField("token"))).as("keyphrases"),
        round(max(when(col("rn") === 1, col("tfidf"))), 6).as("top_tfidf"))
  }

  val all: Seq[Q] = Seq(d17Containment, t23Keyphrases)
}
