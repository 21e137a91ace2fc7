package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch: per-JOB wall-clock attribution for named queries (local
  * iteration only — guide §1 "measure first"). Prints every Spark job the
  * query fires (start offset, duration, call site) plus the driver-side
  * gap (total minus sum of job time): the gap is planning, manifest I/O,
  * filesystem work and other single-threaded driver cost the stage view
  * never shows. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").filter(_.nonEmpty)
    @volatile var jobs =
      scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs(js.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.remove(je.jobId).foreach { case (start, site) =>
          done.add(f"  job ${je.jobId}%4d  +${(start - t0) / 1e9}%7.3f  " +
            f"${(System.nanoTime() - start) / 1e9}%7.3f s  $site")
        }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { pass =>
        done.clear(); jobs.clear()
        t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat to drain
        Thread.sleep(300)
        val lines = done.toArray(Array.empty[String]).sorted
        println(s"==== $n pass $pass: total ${math.round(total * 1000) / 1000.0} s, ${lines.length} jobs")
        lines.foreach(println)
        val jobSum = lines.map(_.trim.split("\\s+")(3).toDouble).sum
        println(f"  sum(job wall) = $jobSum%.3f s; driver-side gap = ${total - jobSum}%.3f s (overlap makes this approximate)")
      }
    }
    spark.stop()
  }
}
