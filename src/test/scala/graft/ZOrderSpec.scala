package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The Z-order layout's payoff, measured: writing lineitem range-
  * partitioned + sorted by the Morton value makes a z-range scan skip
  * most parquet row groups (min/max stats), while the identical data
  * written in arrival order skips nothing. The curve expression itself
  * is hash-checked by c10_zorder_curve; this pins the LAYOUT property
  * that makes it worth computing.
  */
class ZOrderSpec extends SparkSuite {

  private def scanRows(path: String, lo: Int, hi: Int): Long = {
    val df = spark.read.parquet(path).where(col("zv").between(lo, hi))
    df.collect() // executes THIS queryExecution, populating its scan metrics
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    scan.metrics("numOutputRows").value
  }

  test("z-sorted layout prunes row groups; arrival order reads everything") {
    import graft.queries.Extended38.zval
    val a = (col("l_partkey") % 4096).cast("int")
    val b = (col("l_suppkey") % 4096).cast("int")
    val z = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(a.as("a"), b.as("b"), zval(a, b).as("zv"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_").toString

    z.repartitionByRange(16, col("zv")).sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(s"$base/sorted")
    z.repartition(16).write.mode("overwrite").parquet(s"$base/shuffled")

    val total = z.count()
    // a narrow z-range: the lowest 1/16 of the OCCUPIED curve (the key
    // domains at this SF fill only the low bits, so the range must be
    // data-driven to actually be selective)
    val zmax = z.agg(max("zv")).head().getInt(0)
    val (lo, hi) = (0, zmax / 16)
    val sortedRead = scanRows(s"$base/sorted", lo, hi)
    val shuffledRead = scanRows(s"$base/shuffled", lo, hi)

    // range-partition boundaries come from sampling, so the exact file
    // overlap with the probe range varies a little run to run — assert
    // "reads a minority of rows", not an exact fraction
    assert(sortedRead < total / 2,
      s"z-sorted scan read $sortedRead of $total rows — no skipping")
    assert(sortedRead * 2 < shuffledRead,
      s"z-sorted read $sortedRead vs arrival-order $shuffledRead — layout buys nothing")
  }

  test("z-value interleaves: neighbors in both dims share high bits") {
    import graft.queries.Extended38.zval
    import spark.implicits._
    val df = Seq((5, 9), (5, 10), (2000, 3000)).toDF("a", "b")
      .select(zval(col("a"), col("b")).as("zv"))
    val Array(z1, z2, z3) = df.collect().map(_.getInt(0))
    // close points differ only in low bits; the far point differs high
    assert((z1 >> 8) == (z2 >> 8), s"$z1 vs $z2")
    assert((z1 >> 16) != (z3 >> 16), s"$z1 vs $z3")
  }

  /** For each parquet row group under `dir`, this column's [min,max]
    * span as a fraction of the global domain — the quantity row-group
    * pruning keys on: a narrow mean span means a point/range predicate
    * on the column skips most groups. */
  private def meanRowGroupSpan(dir: String, column: String,
      domain: Long): Double = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val spans = files.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString), conf))
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.flatMap { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .map { c =>
              val st = c.getStatistics
              val mn = st.genericGetMin.asInstanceOf[Number].longValue()
              val mx = st.genericGetMax.asInstanceOf[Number].longValue()
              (mx - mn + 1).toDouble / domain
            }
        }
      } finally r.close()
    }
    spans.sum / spans.length
  }

  test("warehouse zorderBy narrows row-group spans on BOTH columns") {
    import graft.sinks.AtomicWarehouse
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"),
        col("l_quantity"), lit(1L).as("load_seq"))
    val base = java.nio.file.Files.createTempDirectory("graft_zwh_").toString
    // single-key clusterBy analogue: sorted on pk only
    AtomicWarehouse.commitEpoch(spark,
      s"$base/single", li.repartitionByRange(8, col("pk"))
        .sortWithinPartitions("pk"), 1L, statsKey = Some("pk"))
    // two-column z-order through the commit path. A curve segment of
    // fraction f spans ~sqrt(f) of EACH dimension, so the payoff needs
    // enough segments: 32 files → ~18% span per column; the suite's
    // default 4 shuffle partitions would leave ~50%.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try AtomicWarehouse.commitEpoch(spark, s"$base/zord", li, 1L,
      statsKey = Some("pk"), zorderBy = Seq("pk", "sk"))
    finally spark.conf.set("spark.sql.shuffle.partitions", before)

    val pkDomain = li.agg(max("pk")).head.getLong(0)
    val skDomain = li.agg(max("sk")).head.getLong(0)
    val zPk = meanRowGroupSpan(s"$base/zord/epoch_1", "pk", pkDomain)
    val zSk = meanRowGroupSpan(s"$base/zord/epoch_1", "sk", skDomain)
    val sPk = meanRowGroupSpan(s"$base/single/epoch_1", "pk", pkDomain)
    val sSk = meanRowGroupSpan(s"$base/single/epoch_1", "sk", skDomain)

    // single-key layout: pk razor-thin, sk full-domain in every group
    assert(sPk < 0.5 && sSk > 0.8, f"single: pk=$sPk%.2f sk=$sSk%.2f")
    // z-order: BOTH columns bounded well below full domain — the
    // multi-column skipping clusterBy cannot give
    assert(zPk < 0.4 && zSk < 0.4, f"zord: pk=$zPk%.2f sk=$zSk%.2f")
    assert(zSk < sSk / 2,
      f"z-order sk span $zSk%.2f not better than single-key $sSk%.2f")
    // round-trip: layout changes bytes, never rows
    assert(spark.read.parquet(s"$base/zord/epoch_1").count() == li.count())
  }

  test("3-column z-order through the SINK option narrows all three spans") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"),
        col("l_orderkey").cast("long").as("ok"),
        lit(1L).as("load_seq"))
    val base = java.nio.file.Files.createTempDirectory("graft_z3_").toString
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // 64 partitions = 6 fixed curve bits = 2 bits per column at n=3, so
    // EVERY column's expected span is ~1/4 of its domain (a cut depth
    // that is not a multiple of n shortchanges the last column — 5 bits
    // would leave ok at ~1/2 span)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    // through the DSv2 sink's commit-time layout pass — the user-facing
    // form (`.option("zorderBy", ...)`), not the engine API
    try {
      li.write.format("graft-warehouse")
        .option("path", s"$base/wh").option("seq", "1")
        .option("zorderBy", "pk,sk,ok").option("statsKey", "pk")
        .mode("append").save()
      li.write.format("graft-warehouse")
        .option("path", s"$base/wh2").option("seq", "1")
        .option("zorderBy", "pk,sk").option("statsKey", "pk")
        .mode("append").save()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)

    def dom(c: String) = li.agg(max(c)).head.getLong(0)
    val (zPk, zSk, zOk) = (
      meanRowGroupSpan(s"$base/wh/epoch_1", "pk", dom("pk")),
      meanRowGroupSpan(s"$base/wh/epoch_1", "sk", dom("sk")),
      meanRowGroupSpan(s"$base/wh/epoch_1", "ok", dom("ok")))
    // every column — including the THIRD — must sit well under full
    // span (sampling-based range boundaries blur the exact fraction)
    assert(zPk < 0.55 && zSk < 0.55 && zOk < 0.55,
      f"3-col zord: pk=$zPk%.2f sk=$zSk%.2f ok=$zOk%.2f")
    // and the third column must beat what a 2-column curve leaves it at
    // (uninterleaved = near-full span in every row group)
    val twoColOk = meanRowGroupSpan(s"$base/wh2/epoch_1", "ok", dom("ok"))
    assert(zOk < twoColOk / 1.5,
      f"3-col ok span $zOk%.2f vs 2-col $twoColOk%.2f — interleaving ok bought nothing")
    assert(spark.read.parquet(s"$base/wh/epoch_1").count() == li.count())
    // 5 columns refuse loudly
    val e = intercept[Exception](
      li.withColumn("x", lit(1L)).withColumn("y", lit(2L))
        .write.format("graft-warehouse")
        .option("path", s"$base/wh5").option("seq", "1")
        .option("zorderBy", "pk,sk,ok,x,y").mode("append").save())
    assert(e.getMessage.contains("2-4"), e.getMessage)
  }
}
