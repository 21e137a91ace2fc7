package graft
import org.apache.spark.sql.SparkSession
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5)
          |SELECT sum(n) AS s FROM t""".stripMargin).collect()
      println("RECURSIVE_OK " + r.mkString(","))
    } catch { case e: Throwable => println("RECURSIVE_FAIL " + e.getMessage.take(200)) }
    try {
      val r = spark.sql("SELECT regexp_count('aeiou xx eep', '[aeiou]+') AS c").collect()
      println("REGEXP_COUNT_OK " + r.mkString(","))
    } catch { case e: Throwable => println("REGEXP_COUNT_FAIL " + e.getMessage.take(200)) }
    spark.stop()
  }
}
