package graft
import org.apache.spark.sql.SparkSession
/** Scratch: print the static sparkPlan of named queries (local iteration only). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.getOrElse("SPARK_GRAFT_QUERIES", "").split(",").filter(_.nonEmpty).foreach { n =>
      println(s"==== $n")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").queryExecution.sparkPlan.toString.take(4000))
    }
    spark.stop()
  }
}
