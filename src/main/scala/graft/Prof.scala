package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler (local iteration only). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    // warm scans
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.count()

    for (round <- 1 to 2) {
      println(s"== round $round")
      val cands = time("lshCandidates") {
        val c = text.NearDup.lshCandidates(docs, "doc_id", col("text"), 3, 8, 8)
        c.count(); c
      }
      time("jaccardOnPairs") {
        text.NearDup.jaccardOnPairs(docs, cands, "doc_id", col("text"), 3).count()
      }
      time("connectedComponents") {
        text.DupClusters.connectedComponents(
          docs.select(col("doc_id").as("id")), cands).count()
      }
      time("d6 full") {
        SparkEntry.queries("d6_dup_clusters")(spark, sfDir).count()
      }
      time("d5 full") {
        SparkEntry.queries("d5_ngram_jaccard")(spark, sfDir).count()
      }
      time("c1 full") {
        SparkEntry.queries("c1_curation_pipeline")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
