package graft.sources.v2

import graft.SparkSuite
import graft.sinks.AtomicWarehouse
import org.apache.spark.sql.functions._

/** The warehouse catalog plugin: SQL-by-name reads, VERSION AS OF /
  * TIMESTAMP AS OF time travel, table listing, and the read-only DDL
  * contract. */
class WarehouseCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("wh_cat").toString
    spark.conf.set("spark.sql.catalog.whcat",
      "graft.sources.v2.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.whcat.root", r)
    r
  }

  private def rows(lo: Int, hi: Int, seq: Long) =
    (lo to hi).map(i => (i.toLong, s"n$i", seq))
      .toDF("k", "name", "load_seq")

  test("SQL reads a warehouse by name; VERSION AS OF travels") {
    AtomicWarehouse.commitEpoch(spark, s"$root/videos", rows(1, 10, 1L), 1L)
    // ext4 mtime granularity is fine-grained but keep a visible gap for
    // the TIMESTAMP AS OF boundary below
    Thread.sleep(1100)
    val betweenCommits = java.time.Instant.now()
    Thread.sleep(1100)
    AtomicWarehouse.commitEpoch(spark, s"$root/videos", rows(11, 30, 2L), 2L)

    assert(spark.sql("SELECT count(*) AS c FROM whcat.videos")
      .head.getLong(0) == 30)
    assert(spark.sql("SELECT count(*) AS c FROM whcat.videos VERSION AS OF 1")
      .head.getLong(0) == 10)
    val ts = java.sql.Timestamp.from(betweenCommits).toString
    assert(spark.sql(
      s"SELECT count(*) AS c FROM whcat.videos TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == 10)
  }

  test("catalog queries inherit the pruning scan (filters pushed)") {
    AtomicWarehouse.commitEpoch(spark, s"$root/pruned", rows(1, 100, 1L), 1L,
      statsKey = Some("k"))
    AtomicWarehouse.commitEpoch(spark, s"$root/pruned",
      rows(1000, 1100, 2L), 2L, statsKey = Some("k"))
    val df = spark.sql("SELECT k, name FROM whcat.pruned WHERE k >= 1000")
    assert(df.count() == 101)
    assert(df.queryExecution.executedPlan.toString.contains("graft-warehouse"))
  }

  test("SHOW TABLES lists only manifest-bearing dirs") {
    AtomicWarehouse.commitEpoch(spark, s"$root/listed", rows(1, 3, 1L), 1L)
    new java.io.File(s"$root/not_a_warehouse").mkdirs()
    val names = spark.sql("SHOW TABLES IN whcat").select("tableName")
      .as[String].collect().toSet
    assert(names.contains("listed"))
    assert(!names.contains("not_a_warehouse"))
  }

  test("DESCRIBE EXTENDED surfaces warehouse facts as table properties") {
    AtomicWarehouse.commitEpoch(spark, s"$root/props", rows(1, 5, 1L), 1L)
    AtomicWarehouse.commitEpoch(spark, s"$root/props", rows(6, 9, 2L), 2L)
    val desc = spark.sql("DESCRIBE TABLE EXTENDED whcat.props")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val props = desc.getOrElse("Table Properties", "")
    assert(props.contains("manifestVersion=2") &&
      props.contains("committedEntries=2"), props)
  }

  test("SQL DELETE maps to the key purge; arbitrary predicates refuse") {
    val delRoot = java.nio.file.Files.createTempDirectory("wh_del").toString
    spark.conf.set("spark.sql.catalog.whdel",
      "graft.sources.v2.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.whdel.root", delRoot)
    spark.conf.set("spark.sql.catalog.whdel.mergeKey", "k")
    AtomicWarehouse.commitEpoch(spark, s"$delRoot/t", rows(1, 10, 1L), 1L,
      statsKey = Some("k"), bloomKey = Some("k"))
    AtomicWarehouse.commitEpoch(spark, s"$delRoot/t", rows(5, 20, 2L), 2L,
      statsKey = Some("k"), bloomKey = Some("k"))

    spark.sql("DELETE FROM whdel.t WHERE k IN (3, 7, 15)")
    val left = spark.sql("SELECT DISTINCT k FROM whdel.t")
      .as[Long].collect().toSet
    assert(left == (1L to 20L).toSet -- Set(3L, 7L, 15L))

    // not a key-identity predicate → refused at analysis
    val e = intercept[Exception](
      spark.sql("DELETE FROM whdel.t WHERE name = 'n4'"))
    assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
    // nothing changed
    assert(spark.sql("SELECT count(DISTINCT k) AS c FROM whdel.t")
      .head.getLong(0) == 17)
  }

  test("DDL through the catalog refuses with a drain pointer") {
    AtomicWarehouse.commitEpoch(spark, s"$root/fixed", rows(1, 3, 1L), 1L)
    val e = intercept[Exception](
      spark.sql("DROP TABLE whcat.fixed"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("AtomicWarehouse")), msgs(e).mkString("; "))
  }
}
