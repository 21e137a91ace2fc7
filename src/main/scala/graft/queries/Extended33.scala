package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 widening, part 33: sketch-based heavy hitters with a hard
  * error-bound oracle (a8's pattern applied to count-min), and the
  * classic sparse-vector similarity self-join through an inverted index.
  */
object Extended33 {

  private def toks = filter(split(trim(col("text")), "\\s+"), x => x =!= "")

  private val tokCte =
    """  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents""".stripMargin

  /** A21 — count-min-sketch heavy hitters, bound-checked: the exact
    * top-20 token counts come from a plain aggregation; the same stream
    * feeds Spark's `count_min_sketch` (eps=0.001, conf=0.99, fixed seed)
    * and each top token is probed against the sketch. CMS can only
    * OVERestimate, by at most eps·N with probability ≥ conf, so the
    * hashed output carries `cms_ok = exact ≤ est ≤ exact + eps·N` and the
    * oracle expects all-true (with the exact counts alongside) — a hard
    * gate on sketch behavior without hashing sketch internals, same
    * pattern as a8. The final 20-row probe loop runs on the driver
    * because that is where a merged sketch lives by design (the whole
    * point of a sketch is that it is small enough to collect).
    *
    * Scale: the sketch aggregate is partial-merged (each partition builds
    * its own CMS, merged pairwise — adds are commutative so the result is
    * partitioning-independent); the exact side is one token shuffle that
    * exists only to ground the bound check. */
  val a21CmsHeavyHitters = q("a21_cms_heavy_hitters",
    s"""WITH tok AS (
       |$tokCte),
       |w AS (SELECT unnest(t) AS token FROM tok),
       |c AS (SELECT token, count(*) AS n FROM w GROUP BY 1)
       |SELECT token, CAST(n AS BIGINT) AS exact_n, true AS cms_ok FROM c
       |ORDER BY n DESC, token ASC LIMIT 20""".stripMargin) { (s, d) =>
    import s.implicits._
    val words = Tables.documents(s, d).select(explode(toks).as("token"))
    val agg = words.agg(
      expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("total"))
      .head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]]("cms")))
    val slack = math.ceil(0.001 * agg.getAs[Long]("total")).toLong
    val top = words.groupBy("token").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token").asc).limit(20)
      .collect()
      .map { r =>
        val exact = r.getLong(1)
        val est = sketch.estimateCount(r.getString(0))
        (r.getString(0), exact, est >= exact && est <= exact + slack)
      }
    top.toSeq.toDF("token", "exact_n", "cms_ok")
  }

  /** T33 — sparse cosine similarity self-join via inverted index: each
    * document is a sparse count-vector over its BIGRAMS (the unigram
    * vocab of this corpus is ~31 tokens — bigrams give a real sparse
    * space), pairs are generated ONLY through shared postings (join on
    * the term, never doc×doc), and a df-cutoff drops stopword-like terms
    * whose postings would explode quadratically — the standard bound
    * that makes sparse similarity joins tractable: cost is
    * Σ_term df(term)², capped by the cutoff, not |corpus|².
    *
    * Exactness: dot products and squared norms are INTEGER sums of
    * per-term count products (order-independent, so partitioning can't
    * perturb them); the single sqrt+divide at the end is the same IEEE
    * expression in both engines, rounded through the shared
    * VARCHAR→DECIMAL route. */
  val t33SparseCosinePairs = q("t33_sparse_cosine_pairs",
    s"""WITH tok AS (
       |$tokCte),
       |bg AS (
       |  SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
       |         ELSE list_transform(generate_series(1, len(t) - 1),
       |                             i -> t[i] || ' ' || t[i + 1]) END) AS term
       |  FROM tok),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM bg GROUP BY 1, 2),
       |keep AS (SELECT term FROM tf GROUP BY term HAVING count(*) <= 50),
       |p AS (SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN keep USING (term)),
       |nrm AS (SELECT doc_id, sum(tf * tf) AS n2 FROM p GROUP BY 1),
       |dots AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.tf * b.tf) AS dot
       |  FROM p a JOIN p b ON a.term = b.term AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.doc_a, d.doc_b, CAST(d.dot AS BIGINT) AS dot,
       |         d.dot / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)) AS cos
       |  FROM dots d JOIN nrm na ON d.doc_a = na.doc_id
       |              JOIN nrm nb ON d.doc_b = nb.doc_id)
       |SELECT doc_a, doc_b, dot, ${rnd("cos", 4)} AS cos
       |FROM scored WHERE cos >= 0.5""".stripMargin) { (s, d) =>
    val bg = Tables.documents(s, d).select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(
        when(size(col("t")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("t")) - 1),
            i => concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)))))
        .as("term"))
    val tf = bg.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df-cutoff: a term in >50 docs contributes >C(50,2) pairs and ~no
    // discrimination — drop before the pair join, not after
    val keep = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") <= 50).select("term")
    val p = tf.join(keep, "term")
    val nrm = p.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
    val a = p.select(col("term"), col("doc_id").as("doc_a"), col("tf").as("tfa"))
    val b = p.select(col("term"), col("doc_id").as("doc_b"), col("tf").as("tfb"))
    val dots = a.join(b, Seq("term"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("tfa") * col("tfb")).as("dot"))
    dots
      .join(nrm.select(col("doc_id").as("doc_a"), col("n2").as("na")), Seq("doc_a"))
      .join(nrm.select(col("doc_id").as("doc_b"), col("n2").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("dot").cast("long").as("dot"),
        (col("dot") / sqrt((col("na") * col("nb")).cast("double"))).as("cos"))
      .where(col("cos") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("dot"), round(col("cos"), 4).as("cos"))
  }

  val all: Seq[Q] = Seq(a21CmsHeavyHitters, t33SparseCosinePairs)
}
