package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicate the sf0.1 corpus K× (unique ids; text
  * perturbed per replica so the dup-graph density stays constant instead
  * of exploding quadratically) and measure the heavy operators at 1× vs
  * K×. Near-linear growth is the local evidence for the 100 TB claim:
  * every probed operator's expensive phase is bounded by corpus size (or
  * dup-graph size), never by corpus². Results recorded in BENCH.md.
  *
  * Writes only under /tmp; run: `sbt "runMain graft.ScaleProbe [K]"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    val emb = Tables.embeddings(spark, sfDir)
    val nVecs = emb.agg(max("vec_id")).head.getLong(0) + 1

    def replicate(df: DataFrame, idCol: String, n: Long,
        perturb: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map { r =>
        val shifted = df.withColumn(idCol, col(idCol) + lit(r * n))
        if (r == 0) shifted else perturb(shifted, r)
      }.reduce(_.unionByName(_))

    // per-replica alphabet rotation rewrites EVERY token, so replicas are
    // independent sub-corpora: the dup graph scales linearly with the
    // corpus (K copies of the same graph) instead of K²-densifying into
    // one giant cross-replica near-dup cluster. (The latter is a valid
    // adversarial probe too — see BENCH.md — but it measures collision
    // density, not corpus growth.)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    replicate(docs, "doc_id", nDocs, (d, r) =>
      d.withColumn("text",
        translate(col("text"), alpha, alpha.drop(r % 26) + alpha.take(r % 26))))
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    // cosine is scale-invariant, so a multiplicative bump would leave
    // replicas as exact semantic dups; a dim-and-replica-dependent offset
    // actually rotates the vector
    replicate(emb, "vec_id", nVecs, (d, r) =>
      d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          x + ((i * r % 13) - 6).cast("float") / 20f)))
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")

    val probes = Seq("d1_exact_dedup", "d2_minhash_signature", "d6_dup_clusters",
      "d14_simhash64_hamming", "d11_segment_dedup",
      "t21_mix_weights", "m3_audio_windows", "v12_semdedup",
      "c1_curation_pipeline",
      // round-2 part-27+ additions (documents/embeddings-only readers)
      "t29_boilerplate_strip", "t32_ngram_novelty", "d19_incremental_dedup",
      "d20_method_agreement", "m7_patch_dedup", "m8_shot_boundaries",
      "v22_ivf_pq_topk", "p11_priority_sample")

    def timeIt(dir: String, name: String): Double = {
      // steady-state: one untimed warmup, then one timed run
      SparkEntry.queries(name)(spark, dir).count()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"""| query | 1x s | ${k}x s | ratio (linear = $k) |""")
    println("|---|---|---|---|")
    probes.foreach { name =>
      val t1 = timeIt(sfDir, name)
      val tk = timeIt(base, name)
      println(f"| `$name` | $t1%.2f | $tk%.2f | ${tk / t1}%.1f |")
    }
    spark.stop()
  }
}
