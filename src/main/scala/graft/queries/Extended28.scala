package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextAnalysis

/** Round-2 widening, part 28: the composed IVF-PQ search path (coarse
  * probe → ADC rerank in one plan), video shot-boundary detection over
  * sampled frames, JSON key-set schema-drift profiling, and per-segment
  * code-switch (mixed-language) detection.
  */
object Extended28 {

  /** V22 — end-to-end IVF-PQ search (Jégou et al. TPAMI'11, non-residual
    * variant): the query probes the 3 nearest coarse cells (full-vector
    * L2 against the broadcast codebook), and ONLY vectors assigned to
    * those cells are reranked by PQ asymmetric distance (v14's codes +
    * the query's broadcast LUT). This is the complete billion-scale ANN
    * read path: v7 (cell assignment) + v14 (codes) + v15 (ADC) composed
    * into one plan, with the candidate set cut by the probe BEFORE any
    * per-vector distance work.
    *
    * Shape at scale: codebook + probe list + LUT all broadcast; cell
    * filter is a semi join that shrinks the ADC input to nprobe/ncells of
    * the corpus; sub-distances localCheckpoint once and feed assignment,
    * LUT, and codes without recomputation. */
  val v22IvfPq = q("v22_ivf_pq_topk", {
    val sub = (0 until 4).map { b =>
      s"""list_sum(list_transform(generate_series(${b * 16 + 1}, ${b * 16 + 16}),
         |           i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) -
         |                 CAST(s.ce[CAST(i AS INT)] AS DOUBLE)) ^ 2)) AS dist$b""".stripMargin
    }.mkString(",\n         ")
    s"""WITH seeds AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id <= 10),
       |pairs AS (
       |  SELECT e.vec_id, s.cid,
       |         $sub
       |  FROM embeddings e CROSS JOIN seeds s),
       |full_d AS (
       |  SELECT vec_id, cid, dist0 + dist1 + dist2 + dist3 AS fd FROM pairs),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY fd ASC, cid ASC) AS rn
       |    FROM full_d WHERE vec_id <> 42) WHERE rn = 1),
       |probe AS (
       |  SELECT cid AS cell FROM full_d WHERE vec_id = 42
       |  ORDER BY fd ASC, cid ASC LIMIT 3),
       |cand AS (SELECT vec_id FROM cells JOIN probe USING (cell)),
       |long AS (
       |  SELECT vec_id, cid, CAST(u.b AS INT) AS b,
       |         CASE u.b WHEN 0 THEN dist0 WHEN 1 THEN dist1
       |                  WHEN 2 THEN dist2 ELSE dist3 END AS dist
       |  FROM pairs CROSS JOIN range(0, 4) u(b)),
       |codes AS (
       |  SELECT vec_id, b, cid FROM (
       |    SELECT vec_id, b, cid,
       |           row_number() OVER (PARTITION BY vec_id, b
       |                              ORDER BY dist ASC, cid ASC) AS rn
       |    FROM long WHERE vec_id <> 42) WHERE rn = 1),
       |lut AS (SELECT cid, b, dist FROM long WHERE vec_id = 42),
       |adc AS (
       |  SELECT c.vec_id,
       |         max(CASE WHEN c.b = 0 THEN t.dist END) AS a0,
       |         max(CASE WHEN c.b = 1 THEN t.dist END) AS a1,
       |         max(CASE WHEN c.b = 2 THEN t.dist END) AS a2,
       |         max(CASE WHEN c.b = 3 THEN t.dist END) AS a3
       |  FROM codes c
       |  JOIN cand ON c.vec_id = cand.vec_id
       |  JOIN lut t ON c.b = t.b AND c.cid = t.cid
       |  GROUP BY 1)
       |SELECT vec_id, ${rnd("a0 + a1 + a2 + a3", 4)} AS adc_dist
       |FROM adc
       |ORDER BY ${rnd("a0 + a1 + a2 + a3", 4)} ASC, vec_id ASC
       |LIMIT 10""".stripMargin
  }) { (s, d) =>
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.vec.Similarity.asDouble(col("embedding")).as("v"))
    val seeds = emb.where(col("vec_id") <= 10)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    def subDist(b: Int) =
      aggregate(zip_with(slice(col("v"), b * 16 + 1, 16), slice(col("c"), b * 16 + 1, 16),
        (a, x) => (a - x) * (a - x)), lit(0.0), (acc, x) => acc + x)
    // sub-distances computed ONCE; assignment (sum), codes (argmin), and
    // the query LUT all read this checkpoint
    val parts = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cid"),
        array((0 until 4).map(b => subDist(b)): _*).as("ds"))
      .localCheckpoint(true)
    val fullD = parts.select(col("vec_id"), col("cid"),
      (element_at(col("ds"), 1) + element_at(col("ds"), 2) +
        element_at(col("ds"), 3) + element_at(col("ds"), 4)).as("fd"))
    val cells = fullD.where(col("vec_id") =!= 42)
      .groupBy("vec_id")
      .agg(min(struct(col("fd"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cell"))
    val probe = fullD.where(col("vec_id") === 42)
      .orderBy(col("fd").asc, col("cid").asc).limit(3)
      .select(col("cid").as("cell"))
    val cand = cells.join(broadcast(probe), Seq("cell"))
      .select("vec_id")
    val long = parts.select(col("vec_id"), col("cid"),
      posexplode(col("ds")).as(Seq("b", "dist")))
    val codes = long.where(col("vec_id") =!= 42)
      .join(cand, Seq("vec_id"), "left_semi")
      .groupBy("vec_id", "b")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("b"), col("m.cid").as("cid"))
    val lut = long.where(col("vec_id") === 42)
      .select(col("b"), col("cid"), col("dist"))
    val aggs = (0 until 4).map(b =>
      max(when(col("b") === b, col("dist"))).as(s"a$b"))
    codes.join(broadcast(lut), Seq("b", "cid"))
      .groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        round(col("a0") + col("a1") + col("a2") + col("a3"), 4).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** M8 — shot-boundary detection: frames sampled every 5 tokens (m2's
    * layout), each reduced to a 16-bit md5 signature; a boundary is a
    * Hamming jump > 8 bits between consecutive frames — the classic
    * histogram-difference cut detector with the histogram stubbed by a
    * deterministic hash feature (codecs aren't in this container; the
    * Spark-side plumbing — ordering, lag window, per-video aggregation —
    * is the real operator). One shuffle on doc_id shared by the lag
    * window and the final rollup. */
  val m8ShotBoundaries = q("m8_shot_boundaries",
    """WITH tok AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, CAST(fidx - 1 AS INT) AS frame_idx,
      |         CAST(('0x' || substr(md5(t[fidx]), 1, 4)) AS BIGINT) AS sig
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t), 5)) AS fidx FROM tok)),
      |flag AS (
      |  SELECT doc_id, frame_idx, sig,
      |         lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
      |  FROM fr)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_frames,
      |       CAST(1 + count(CASE WHEN prev IS NOT NULL
      |                            AND bit_count(xor(sig, prev)) > 8 THEN 1 END) AS BIGINT) AS n_shots
      |FROM flag GROUP BY 1""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .withColumn("fidx", explode(sequence(lit(1), size(col("t")), lit(5))))
      .select(col("doc_id"), (col("fidx") - 1).cast("int").as("frame_idx"),
        conv(substring(md5(element_at(col("t"), col("fidx"))), 1, 4), 16, 10)
          .cast("long").as("sig"))
      .withColumn("prev", lag("sig", 1).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        (lit(1) + count(when(col("prev").isNotNull &&
          bit_count(col("sig").bitwiseXOR(col("prev"))) > 8, 1))).as("n_shots"))
  }

  /** E36 — JSON key-set schema profiling (drift detection): every event's
    * props object reduces to its sorted key list; the profile counts
    * events per key-set shape. A new producer version shipping an extra
    * field shows up as a new shape row — the cheap first alarm before a
    * full schema registry. Scan-side key extraction, one aggregation. */
  val e36PropsSchema = q("e36_props_schema",
    """SELECT coalesce(array_to_string(list_sort(json_keys(props)), ','), '') AS key_set,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM events
      |GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(coalesce(
        concat_ws(",", sort_array(map_keys(
          from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))))), lit(""))
        .as("key_set"))
      .groupBy("key_set")
      .agg(count(lit(1)).as("n_events"))
  }

  /** T30 — code-switch detection: the document's t1 language vs the
    * per-10-token-segment language; a segment voting for a DIFFERENT
    * non-'und' language flags intra-document language mixing (docs to
    * route to a multilingual pipeline rather than a monolingual one).
    * Segmenting is scan-side; the only shuffle is the per-doc rollup. */
  val t30CodeSwitch = q("t30_code_switch", {
    def scoresSql(tExpr: String) = Seq("sizish", "sqlish", "storish", "streamish")
      .map(l => s"len(list_filter($tExpr, x -> x IN ${TextQueries.markerSqlFor(l)})) AS s_$l")
      .mkString(",\n         ")
    val langCase =
      """CASE WHEN s_sizish > 0 AND s_sizish >= s_sqlish AND s_sizish >= s_storish
        |                 AND s_sizish >= s_streamish THEN 'sizish'
        |            WHEN s_sqlish > 0 AND s_sqlish >= s_storish
        |                 AND s_sqlish >= s_streamish THEN 'sqlish'
        |            WHEN s_storish > 0 AND s_storish >= s_streamish THEN 'storish'
        |            WHEN s_streamish > 0 THEN 'streamish'
        |            ELSE 'und' END""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |doc_lang AS (
       |  SELECT doc_id, $langCase AS doc_lang FROM (
       |    SELECT doc_id,
       |         ${scoresSql("t")}
       |    FROM tok)),
       |seg AS (
       |  SELECT doc_id, i AS seg_idx, t[(i*10+1):(i*10+10)] AS st
       |  FROM (SELECT doc_id, t,
       |               unnest(generate_series(0, CAST(floor((len(t)-1)/10.0) AS INT))) AS i
       |        FROM tok WHERE len(t) > 0)),
       |seg_lang AS (
       |  SELECT doc_id, seg_idx, $langCase AS seg_lang FROM (
       |    SELECT doc_id, seg_idx,
       |         ${scoresSql("st")}
       |    FROM seg))
       |SELECT s.doc_id, any_value(d.doc_lang) AS doc_lang,
       |       CAST(count(*) AS BIGINT) AS n_segs,
       |       CAST(count(CASE WHEN s.seg_lang <> 'und'
       |                        AND s.seg_lang <> d.doc_lang THEN 1 END) AS BIGINT) AS n_foreign,
       |       count(CASE WHEN s.seg_lang <> 'und'
       |                   AND s.seg_lang <> d.doc_lang THEN 1 END) > 0 AS code_switched
       |FROM seg_lang s JOIN doc_lang d ON s.doc_id = d.doc_id
       |GROUP BY 1""".stripMargin
  }) { (s, d) =>
    val markers = TextQueries.markers
    val toks = TextAnalysis.tokens(col("text"))
    val segIdx = expr("sequence(0, int(floor((size(__t) - 1) / 10.0)))")
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("__t"),
        TextAnalysis.langId(col("text"), markers).as("doc_lang"))
      .where(size(col("__t")) > 0)
    base.select(col("doc_id"), col("doc_lang"), posexplode(
        transform(segIdx,
          i => array_join(slice(col("__t"), i * 10 + 1, lit(10)), " ")))
        .as(Seq("seg_idx", "seg")))
      .withColumn("seg_lang", TextAnalysis.langId(col("seg"), markers))
      .groupBy("doc_id")
      .agg(first("doc_lang").as("doc_lang"),
        count(lit(1)).as("n_segs"),
        count(when(col("seg_lang") =!= "und" &&
          col("seg_lang") =!= col("doc_lang"), 1)).as("n_foreign"),
        (count(when(col("seg_lang") =!= "und" &&
          col("seg_lang") =!= col("doc_lang"), 1)) > 0).as("code_switched"))
  }

  val all: Seq[Q] = Seq(v22IvfPq, m8ShotBoundaries, e36PropsSchema,
    t30CodeSwitch)
}
