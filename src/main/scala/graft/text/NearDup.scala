package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** k-column MinHash signature added as columns sig0..sig{k-1}. */
  def withMinhashSignature(df: DataFrame, text: Column, n: Int, k: Int): DataFrame = {
    val sh = shingles(text, n)
    (0 until k).foldLeft(df.withColumn("__sh", sh)) { (d, i) =>
      d.withColumn(s"sig$i", minhash(col("__sh"), i))
    }.drop("__sh")
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
    * with the number of colliding bands (a cheap similarity proxy). */
  def lshCandidates(df: DataFrame, id: String, text: Column,
      n: Int = 3, k: Int = 8, bands: Int = 4): DataFrame = {
    val sigs = withMinhashSignature(df.select(col(id), text.as("__t")), col("__t"), n, k)
    val banded = sigs.select(col(id) +: bandHashes(k, bands): _*)
    val long = banded.select(col(id), explode(array(
      (0 until bands).map(b => struct(lit(b).as("band"), col(s"band$b").as("h"))): _*
    )).as("bh")).select(col(id), col("bh.band"), col("bh.h"))
    val a = long.select(col(id).as("id_a"), col("band"), col("h"))
    val b = long.select(col(id).as("id_b"), col("band"), col("h"))
    a.join(b, Seq("band", "h"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Exact n-gram Jaccard for given candidate pairs — |A∩B| / |A∪B| over
    * DISTINCT shingles. `docs` must carry (id, text). */
  def jaccardOnPairs(docs: DataFrame, pairs: DataFrame, id: String,
      text: Column, n: Int): DataFrame = {
    val sh = docs.select(col(id), explode(array_distinct(shingles(text, n))).as("sh"))
    val sizes = sh.groupBy(id).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh"))
      .where(col(s"x.$id") < col(s"y.$id"))
      .groupBy(col(s"x.$id").as("id_a"), col(s"y.$id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs.select(col("id_a"), col("id_b"))
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.withColumnRenamed(id, "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed(id, "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 4))
      .select("id_a", "id_b", "jaccard")
  }

  /** 16-bit SimHash from token unigrams: bit b of the hash is the
    * majority vote of the top bit of hex digit b of md5(token). Small but
    * real SimHash — portable to any engine with md5/substr. */
  def simhash16(docTokens: DataFrame, id: String, tok: String): DataFrame = {
    val h = md5(col(tok))
    val bitCols = (0 until 16).map { b =>
      sum(when(substring(h, b + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"s$b")
    }
    val agg = docTokens.groupBy(col(id)).agg(bitCols.head, bitCols.tail: _*)
    val value = (0 until 16).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(id), value.as("simhash"))
  }
}
