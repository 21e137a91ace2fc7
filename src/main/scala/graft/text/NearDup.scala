package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data curation: exact dedup,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design (100 TB):
  *  - signatures/shingles are computed scan-side (no shuffle);
  *  - LSH banding turns the O(n²) pair problem into a groupBy on
  *    (band, bucket-hash) — one shuffle whose fan-in is bounded by
  *    bucket size, with skewed buckets handled by AQE;
  *  - exact Jaccard runs only on LSH candidate pairs (tiny fraction);
  *  - hash functions are engine-portable (md5-based) so any SQL engine
  *    reproduces the same signatures — this is also what the DuckDB
  *    oracle checks.
  */
object NearDup {

  /** Word n-gram shingles of the document (n consecutive tokens). */
  def shingles(text: Column, n: Int): Column = {
    val t = TextAnalysis.tokens(text)
    when(size(t) < n, array(array_join(t, " ")))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
  }

  /** One MinHash value: min over shingles of md5(seed || ':' || shingle).
    * Lexicographic min over hex strings == min over the underlying 128-bit
    * value — portable across engines with no integer-conversion quirks. */
  def minhash(shinglesCol: Column, seed: Int): Column =
    array_min(transform(shinglesCol, s => md5(concat(lit(seed.toString), lit(":"), s))))

  /** k-column MinHash signature (sig0..sig{k-1}) per `id`.
    *
    * Shape matters at scale: explode shingles ONCE, then groupBy(id) with
    * k partial-aggregable `min`s — one shuffle, and each shingle string is
    * materialized a single time. (The naive per-row
    * array_min(transform(...)) form re-inlines the shingle-building
    * expression into every signature column — 8× the work — because
    * Catalyst's CollapseProject duplicates the sub-expression.) */
  def withMinhashSignature(df: DataFrame, id: String, text: Column, n: Int,
      k: Int): DataFrame = {
    // repartition by id BEFORE the expansion: a small input file arrives
    // as one partition, which would serialize the md5-heavy explode; the
    // groupBy below reuses this hash partitioning (no second shuffle).
    val exploded = df.select(col(id), text.as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(id))
      .select(col(id), explode(shingles(col("__text"), n)).as("__shingle"))
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("__shingle")))).as(s"sig$i"))
    exploded.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band hashes: group the k signature columns into `bands` bands of
    * k/bands rows each; band hash = md5 of the concatenated sig rows. */
  def bandHashes(k: Int, bands: Int): Seq[Column] = {
    val rows = k / bands
    (0 until bands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => col(s"sig${b * rows + r}")): _*)).as(s"band$b")
    }
  }

  /** Candidate near-dup pairs (idA < idB) colliding in ≥1 LSH band,
    * with the number of colliding bands (a cheap similarity proxy).
    *
    * Shape: bucket-collect, NOT a self-join. A self-join of the banded
    * table against itself executes the whole minhash pipeline twice and
    * shuffles both sides; collecting ids per (band, bucket) computes
    * signatures once, and pair generation happens inside each bucket with
    * no further shuffle. Output volume is Σ|bucket|²/2 — quadratic in the
    * HOT bucket, so at 100 TB pass `maxBucket` to bound it (below). */
  def lshCandidates(df: DataFrame, id: String, text: Column,
      n: Int = 3, k: Int = 8, bands: Int = 4,
      maxBucket: Int = Int.MaxValue): DataFrame =
    lshCandidatesFromSigs(withMinhashSignature(df, id, text, n, k), id, k,
      bands, maxBucket)

  /** Candidate pairs from an ALREADY-COMPUTED signature table — lets a
    * caller that also needs the signatures themselves (e.g. estimated
    * Jaccard) materialize the minhash pipeline once and fan out.
    *
    * `maxBucket` is the hot-bucket cap: each (band, bucket) keeps at most
    * `maxBucket` members, chosen by a DETERMINISTIC md5 rank of
    * (band, id) — unbiased w.r.t. id order, reproducible across
    * runs/engines, and band-dependent so each band samples a DIFFERENT
    * subset of an oversized cluster (union coverage across bands) — so an
    * adversarial collision cluster of size m contributes
    * O(bands · maxBucket²) candidate pairs instead of O(bands · m²). The
    * cap is applied BEFORE collect_list via a row_number window on the
    * same (band, h) hash partitioning the bucket groupBy needs — Catalyst
    * reuses the exchange (one shuffle either way), and no bucket array
    * ever materializes beyond the cap, so a 10M-member degenerate bucket
    * (empty docs, boilerplate) costs bounded memory, not an OOM. Recall
    * note: a true near-dup CLUSTER that outgrows the cap still dedups —
    * pair coverage within the truncated membership is complete, and
    * transitive clustering (d6) closes the rest — while unrelated docs
    * sharing a degenerate bucket were noise candidates anyway. */
  def lshCandidatesFromSigs(sigs: DataFrame, id: String, k: Int,
      bands: Int, maxBucket: Int = Int.MaxValue): DataFrame = {
    val banded = sigs.select(col(id) +: bandHashes(k, bands): _*)
    val long = banded.select(col(id), explode(array(
      (0 until bands).map(b => struct(lit(b).as("band"), col(s"band$b").as("h"))): _*
    )).as("bh")).select(col(id), col("bh.band"), col("bh.h"))
    val capped =
      if (maxBucket == Int.MaxValue) long
      else long.withColumn("__rk", row_number().over(
          Window.partitionBy(col("band"), col("h"))
            .orderBy(md5(concat(col("band").cast("string"), lit(":cap:"),
              col(id).cast("string"))), col(id))))
        .where(col("__rk") <= maxBucket).drop("__rk")
    val buckets = capped.groupBy("band", "h")
      .agg(array_sort(collect_list(col(id))).as("ids"))
      .where(size(col("ids")) > 1)
    // all (earlier, later) pairs within the sorted bucket → id_a < id_b
    buckets.select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Exact n-gram Jaccard for given candidate pairs — |A∩B| / |A∪B| over
    * DISTINCT shingles. `docs` must carry (id, text).
    *
    * Scale shape: join the PAIRS to per-doc shingle sets and intersect
    * arrays per pair — work is O(candidates × shingles-per-doc), never the
    * quadratic co-shingle self-join (a frequent shingle would otherwise
    * fan out to |bucket|² rows). Shingle sets are built ONLY for documents
    * that appear in a pair (semi join first): after LSH banding the
    * candidate set is orders of magnitude smaller than the corpus, so
    * re-shingling everything would dominate. `pairs` is materialized once
    * (localCheckpoint) because it feeds both the member-id semi join and
    * the verification join — its upstream (the full LSH pipeline) must
    * not execute twice. */
  def jaccardOnPairs(docs: DataFrame, pairs: DataFrame, id: String,
      text: Column, n: Int): DataFrame = {
    val cpPairs = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val members = cpPairs.select(explode(array(col("id_a"), col("id_b"))).as(id))
      .distinct()
    val sets = docs.select(col(id), text.as("__text"))
      .join(members, Seq(id), "left_semi")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col(id))
      .select(col(id), array_distinct(shingles(col("__text"), n)).as("shset"))
    cpPairs
      .join(sets.select(col(id).as("id_a"), col("shset").as("sa")), Seq("id_a"))
      .join(sets.select(col(id).as("id_b"), col("shset").as("sb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter").cast("double")
        / (size(col("sa")) + size(col("sb")) - col("inter")), 4))
      .select("id_a", "id_b", "jaccard")
  }

  /** 16-bit SimHash from token unigrams: bit b of the hash is the
    * majority vote of the top bit of hex digit b of md5(token). Small but
    * real SimHash — portable to any engine with md5/substr. */
  def simhash16(docTokens: DataFrame, id: String, tok: String): DataFrame = {
    // single-pass bit extraction (HexTopBitsPack over md5's first 16
    // digits — fields 0..3 of the packed array), then 4 sums + a count;
    // majority vote per bit as 2·ones_b > n ⟺ the ±1-sum form's s_b > 0
    val packed = docTokens.select(col(id),
      graft.functions.HexTopBitsPack(md5(col(tok))).as("__p"))
    val proj = packed.select(col(id) +:
      (0 until 4).map(f => element_at(col("__p"), f + 1).as(s"p$f")): _*)
    val aggCols = (0 until 4).map(f => sum(col(s"p$f")).as(s"q$f")) :+
      count(lit(1)).as("__n")
    val agg = proj.groupBy(col(id)).agg(aggCols.head, aggCols.tail: _*)
    val value = (0 until 16).map { b =>
      val ones = shiftright(col(s"q${b / 4}"), 16 * (b % 4)).bitwiseAND(lit(65535L))
      when(ones * 2 > col("__n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(id), value.as("simhash"))
  }

  /** 64-bit SimHash at production width, as 4 × 16-bit chunks (`sh0..sh3`
    * — each chunk doubles as its band key, and staying in [0, 65535]
    * sidesteps engine-specific sign-bit semantics of a packed 64-bit
    * long). Bits come from the 64 hex digits of md5(token)·md5('x'·token),
    * majority-voted per bit. With 65536 buckets per band, bucket occupancy
    * stays flat as the corpus grows — where the 16-bit signature's
    * 16-bucket bands saturate (measured: BENCH.md scale probe). One
    * shuffle: the per-doc groupBy; all 64 bit-sums are partial-aggregable. */
  def simhash64Chunks(docTokens: DataFrame, id: String, tok: String): DataFrame = {
    // single-pass bit extraction (graft.functions.HexTopBitsPack): the 64
    // per-bit counters packed four-to-a-long in one codegen'd byte loop —
    // the composed 64 × substring/compare form spent ~6× the signature
    // build there. 16 sums + a count instead of 64 sums; majority vote
    // recovered per bit as 2·ones_b > n. Field width bounds docs at 65535
    // tokens — far past any sane document; pre-chunk (t9) longer.
    val packed = docTokens.select(col(id), graft.functions.HexTopBitsPack(
      concat(md5(col(tok)), md5(concat(lit("x"), col(tok))))).as("__p"))
    val proj = packed.select(col(id) +:
      (0 until 16).map(f => element_at(col("__p"), f + 1).as(s"p$f")): _*)
    val aggCols = (0 until 16).map(f => sum(col(s"p$f")).as(s"q$f")) :+
      count(lit(1)).as("__n")
    val agg = proj.groupBy(col(id)).agg(aggCols.head, aggCols.tail: _*)
    val chunks = (0 until 4).map { j =>
      (0 until 16).map { b =>
        val bit = j * 16 + b
        val ones = shiftright(col(s"q${bit / 4}"), 16 * (bit % 4))
          .bitwiseAND(lit(65535L))
        when(ones * 2 > col("__n"), lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as(s"sh$j")
    }
    agg.select(col(id) +: chunks: _*)
  }
}
