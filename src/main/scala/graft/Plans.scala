package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `explain(formatted)` for selected queries so
  * scan pushdown / join strategy / codegen spans can be audited.
  * `runMain graft.Plans [queryName ...]` */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s2_pushdown_scan", "j1_left_join_default", "a1_grouped_metrics",
        "w4_topk", "d2_minhash_signature")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
