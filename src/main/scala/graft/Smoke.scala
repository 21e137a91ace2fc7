package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: exercises SparkEntry.entry the way the driver's
  * t1 gate does (rows > 0) and prints the query/oracle inventory. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(10, truncate = false)
    println(s"QUERIES=${SparkEntry.queries.size} ORACLES=${SparkEntry.oracleSql.size}")

    // DSv2 connector + SQL-registered custom expressions
    GraftExtensions.register(spark)
    val videos = spark.read.format("graft-videos")
      .option("path", "src/test/resources/fixtures/videos_epoch1.json").load()
    videos.createOrReplaceTempView("videos_api")
    val enriched = spark.sql(
      """SELECT video_id, title_main_code(video_title) AS main_code,
        |       seconds_to_hms(CAST(ingest_seq * 40000 AS BIGINT)) AS dur
        |FROM videos_api WHERE channel_id = 'UC002'""".stripMargin)
    println("DSV2_PLAN_HAS_PUSHDOWN=" +
      enriched.queryExecution.executedPlan.toString.contains("EqualTo(channel_id,UC002)"))
    enriched.show(5, truncate = false)

    // typed MinHash Aggregator over real docs (incremental-signature path)
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val sigs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), explode(text.NearDup.shingles(col("text"), 3)).as("sh"))
      .as[(Long, String)].groupByKey(_._1).mapValues(_._2)
      .agg(new text.MinHashAgg(8).toColumn.name("sig"))
    println(s"MINHASH_AGG_DOCS=${sigs.count()}")
    spark.stop()
  }
}
