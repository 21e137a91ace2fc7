package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-2 widening, part 10: the two sampling ops a contrastive /
  * recommendation training pipeline needs — deterministic negative
  * sampling against an interaction table, and hard-negative mining over
  * embeddings.
  */
object Extended10 {

  /** G7 — deterministic negative sampling (contrastive/recsys training
    * pairs): for each user, draw up to 3 items they have NOT interacted
    * with. Bounded rejection sampling, not a cross join: 10 hash-derived
    * candidate draws per user (md5(user:draw) mod |items|), reject
    * interacted items and repeat draws, keep the first 3 by draw order.
    * Fully deterministic under any partitioning — the property rand()
    * sampling never gives, and the reason the oracle can check it at all.
    *
    * Shape at scale: the item dimension broadcasts twice (index map +
    * count); candidate generation is scan-side (10 rows per user); the
    * only real shuffle is the anti-join against interactions on
    * (user, item) — which is exactly the interaction table's natural
    * partitioning. A user with pathological luck gets < 3 negatives
    * (bounded draws); widen the draw budget, never the join. */
  val g7NegativeSampling = q("g7_negative_sampling",
    """WITH inter AS (
      |  SELECT DISTINCT user_id,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS item
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
      |items AS (
      |  SELECT item, CAST(row_number() OVER (ORDER BY item) AS BIGINT) AS idx
      |  FROM (SELECT DISTINCT item FROM inter)),
      |users AS (SELECT DISTINCT user_id FROM inter),
      |cand AS (
      |  SELECT u.user_id, c.c,
      |         CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':' ||
      |                                  CAST(c.c AS VARCHAR)), 1, 6)) AS BIGINT)
      |           % (SELECT count(*) FROM items) + 1 AS idx
      |  FROM users u CROSS JOIN range(0, 10) c(c)),
      |neg AS (
      |  SELECT w.user_id, w.c, items.item
      |  FROM cand w JOIN items USING (idx)
      |  LEFT JOIN inter i ON i.user_id = w.user_id AND i.item = items.item
      |  WHERE i.user_id IS NULL),
      |ded AS (SELECT user_id, item, min(c) AS c FROM neg GROUP BY 1, 2)
      |SELECT user_id, item AS neg_item,
      |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY c, item) AS INT) AS rn
      |FROM ded QUALIFY rn <= 3""".stripMargin) { (s, d) =>
    val inter = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .where(col("item").isNotNull).distinct()
    val items = inter.select("item").distinct()
      .select(col("item"), row_number().over(Window.orderBy("item"))
        .cast("long").as("idx"))
    val nItems = items.agg(count(lit(1)).as("n"))
    val cand = inter.select("user_id").distinct()
      .withColumn("c", explode(sequence(lit(0), lit(9))))
      .crossJoin(broadcast(nItems))
      .withColumn("idx",
        conv(substring(md5(concat(col("user_id").cast("string"), lit(":"),
          col("c").cast("string"))), 1, 6), 16, 10).cast("long") % col("n") + 1)
    val neg = cand.join(broadcast(items), Seq("idx"))
      .join(inter, Seq("user_id", "item"), "left_anti")
      .groupBy("user_id", "item").agg(min("c").as("c"))
    neg.withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("c"), col("item"))).cast("int"))
      .where(col("rn") <= 3)
      .select(col("user_id"), col("item").as("neg_item"), col("rn"))
  }

  /** V13 — hard-negative mining: for each query vector, the top-3 most
    * cosine-similar vectors with a DIFFERENT label — the pairs that teach
    * a contrastive model the most (similar representation, wrong class).
    * Brute-force baseline over the v1 query subset; at scale the corpus
    * side narrows to the ANN candidates (v3) exactly as v8 composes.
    * Norms computed once per side; per-pair work is one codegen VecDot. */
  val v13HardNegatives = q("v13_hard_negatives",
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(c.label AS INT) AS neg_label,
       |         ${rnd("list_dot_product(q.v, c.v) / (nq.nrm * nc.nrm)", 3)} AS cos
       |  FROM e q JOIN e c ON q.label <> c.label
       |  JOIN n nq ON nq.vec_id = q.vec_id
       |  JOIN n nc ON nc.vec_id = c.vec_id
       |  WHERE q.vec_id < 10)
       |SELECT query_id, neighbor_id, neg_label, cos, CAST(rn AS INT) AS rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY cos DESC, neighbor_id ASC) AS rn
       |  FROM scored) WHERE rn <= 3""".stripMargin) { (s, d) =>
    import graft.vec.Similarity
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        Similarity.asDouble(col("embedding")).as("v"))
    val qs = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("ql"),
        col("v").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
    val corpus = emb
      .select(col("vec_id").as("neighbor_id"), col("label").as("cl"),
        col("v").as("cv"))
      .withColumn("cn", Similarity.norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    qs.join(corpus, col("ql") =!= col("cl"))
      .withColumn("cos",
        round(Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 3))
      .withColumn("rn", row_number().over(w).cast("int"))
      .where(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"),
        col("cl").cast("int").as("neg_label"), col("cos"), col("rn"))
  }

  /** D15 — fuzzy-dedup verification: LSH candidate pairs (d3's banding)
    * confirmed by character-level edit distance — the verifier of choice
    * when shingle Jaccard (d5) is too coarse (OCR noise, small in-place
    * edits). The dup rule is RELATIVE (edit_dist ≤ 20% of the longer
    * text, integer form 5·d ≤ maxlen) so short and long documents face
    * the same bar.
    *
    * Shape at scale: Levenshtein is O(len²) per pair — the expensive
    * verify — so it runs ONLY on the banding candidates (bounded by the
    * near-dup structure, never corpus²); the two text lookups are joins
    * on the corpus's natural doc_id partitioning. */
  val d15FuzzyVerify = q("d15_fuzzy_verify",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |              ELSE list_transform(generate_series(1, len(t) - 2),
      |                                  i -> array_to_string(t[i:i+2], ' ')) END AS shingles
      |  FROM tok),
      |sigs AS (
      |  SELECT doc_id, u.band,
      |         md5(list_min(list_transform(shingles, s -> md5(u.band || ':' || s)))) AS h
      |  FROM sh CROSS JOIN range(0, 8) u(band)),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sigs a JOIN sigs b ON a.band = b.band AND a.h = b.h
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      |lev AS (
      |  SELECT p.id_a, p.id_b,
      |         CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
      |         CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len
      |  FROM pairs p JOIN documents da ON da.doc_id = p.id_a
      |  JOIN documents db ON db.doc_id = p.id_b)
      |SELECT id_a, id_b, edit_dist, (edit_dist * 5 <= max_len) AS is_dup
      |FROM lev""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = graft.text.NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
      .select("id_a", "id_b")
    val ta = docs.select(col("doc_id").as("id_a"), col("text").as("ta"))
    val tb = docs.select(col("doc_id").as("id_b"), col("text").as("tb"))
    pairs.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
        greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
      .select(col("id_a"), col("id_b"), col("edit_dist"),
        (col("edit_dist") * 5 <= col("max_len")).as("is_dup"))
  }

  val all: Seq[Q] = Seq(g7NegativeSampling, v13HardNegatives, d15FuzzyVerify)
}
