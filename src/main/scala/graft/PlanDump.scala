package graft

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` of named queries to plans/<dir>/<q>_<tag>.txt
  * (judge evidence for optimization rounds). Usage:
  *   SPARK_GRAFT_QUERIES=a,b sbt "runMain graft.PlanDump r16 before"
  * Only DECLARATIVE plans are dumpable — queries that drive streaming
  * fixtures or imperative DML compose many plans and are skipped with a
  * note (their evidence is job-level, not plan-level). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "r16"
    val tag = if (args.length > 1) args(1) else "plan"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get("plans", dir)
    java.nio.file.Files.createDirectories(out)
    sys.env.getOrElse("SPARK_GRAFT_QUERIES", "").split(",")
      .filter(_.nonEmpty).foreach { n =>
        val txt =
          try {
            val df = SparkEntry.queries(n)(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch {
            case e: Throwable =>
              s"(plan capture failed: ${e.getClass.getName}: ${e.getMessage})"
          }
        java.nio.file.Files.write(out.resolve(s"${n}_$tag.txt"),
          txt.getBytes("UTF-8"))
        println(s"wrote plans/$dir/${n}_$tag.txt")
      }
    spark.stop()
  }
}
