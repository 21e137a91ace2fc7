package graft.sources.v2

import graft.SparkSuite
import graft.sinks.AtomicWarehouse
import org.apache.spark.sql.functions._

/** The SQL CALL maintenance verbs (compact / vacuum /
  * describe_history), the exclusive CREATE TABLE conf publish, and the
  * `_pos` metadata column's tie-breaking contract. */
class WarehouseProceduresSpec extends SparkSuite {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("wh_proc").toString
    spark.conf.set("spark.sql.catalog.whp",
      "graft.sources.v2.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.whp.root", r)
    spark.conf.set("spark.sql.catalog.whp.mergeKey", "k")
    r
  }

  private def rows(lo: Int, hi: Int, seq: Long) =
    (lo to hi).map(i => (i.toLong, s"n$i", seq))
      .toDF("k", "name", "load_seq")

  test("CALL system.compact folds epochs; describe_history pins the fold") {
    AtomicWarehouse.commitEpoch(spark, s"$root/t1", rows(1, 50, 1L), 1L,
      statsKey = Some("k"))
    AtomicWarehouse.commitEpoch(spark, s"$root/t1", rows(20, 60, 2L), 2L,
      statsKey = Some("k"))
    // the MERGED view is what folding must preserve (the raw SELECT *
    // multiset shrinks by design: shadowed versions fold away)
    val before = AtomicWarehouse.read(spark, s"$root/t1", "k")
      .collect().map(_.toSeq).toSet

    val folded = spark.sql("CALL whp.system.compact('t1')").collect()
    assert(folded.length == 1)
    assert(folded(0).getInt(0) == 2 && folded(0).getInt(1) == 1)

    val hist = spark.sql("CALL whp.system.describe_history('t1')").collect()
    assert(hist.length == 1 && hist(0).getString(1) == "compact")
    // the CALL runs the same engine entry point: reports agree
    val api = AtomicWarehouse.describe(spark, s"$root/t1").collect()
    assert(hist.map(_.toSeq).toSeq == api.map(_.toSeq).toSeq)
    // folding never changes the merged view
    assert(AtomicWarehouse.read(spark, s"$root/t1", "k")
      .collect().map(_.toSeq).toSet == before)
  }

  test("CALL system.vacuum destroys folded-away history") {
    AtomicWarehouse.commitEpoch(spark, s"$root/t2", rows(1, 30, 1L), 1L)
    AtomicWarehouse.commitEpoch(spark, s"$root/t2", rows(31, 60, 2L), 2L)
    spark.sql("CALL whp.system.compact('t2')")
    val vac = spark.sql("CALL whp.system.vacuum('t2', 1, 0)").collect()
    assert(vac.length == 1)
    assert(vac(0).getInt(0) == 2) // manifests v1, v2 dropped
    assert(vac(0).getInt(1) == 2) // the two folded-away epoch dirs
    assert(spark.sql("SELECT count(*) AS c FROM whp.t2").head.getLong(0) == 60)
  }

  test("unknown procedures refuse, naming the available ones") {
    val e = intercept[Exception] {
      spark.sql("CALL whp.system.rewrite_files('t1')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("compact")), msgs(e).mkString("; "))
  }

  test("compact without a mergeKey refuses with the contract") {
    val r2 = java.nio.file.Files.createTempDirectory("wh_proc_nk").toString
    spark.conf.set("spark.sql.catalog.whpnk",
      "graft.sources.v2.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.whpnk.root", r2)
    AtomicWarehouse.commitEpoch(spark, s"$r2/t", rows(1, 5, 1L), 1L)
    AtomicWarehouse.commitEpoch(spark, s"$r2/t", rows(6, 9, 2L), 2L)
    val e = intercept[Exception] {
      spark.sql("CALL whpnk.system.compact('t')").collect()
    }
    assert(e.getMessage.contains("mergeKey"))
  }

  test("racing CREATE TABLE: the conf publish is exclusive") {
    spark.sql(
      """CREATE TABLE whp.race (k BIGINT, v STRING, load_seq BIGINT)
        |USING `graft-warehouse` TBLPROPERTIES ('mergeKey'='k')""".stripMargin)
    // a second publisher that slipped past the exists-check (the race
    // window) must LOSE, not silently replace the winner's conf
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    intercept[IllegalStateException] {
      WarehouseCatalog.writeTableConf(fs, s"$root/race",
        Map("mergeKey" -> "OTHER"))
    }
    assert(WarehouseCatalog.tableConf(fs, s"$root/race")("mergeKey") == "k")
  }

  test("_pos metadata column serves manifest positions; ties break on it") {
    val dir = s"$root/ties"
    // two entries BOTH at load_seq 1 for key 7 (reachable: an external
    // drain counter colliding with a self-sequenced writer's floor)
    AtomicWarehouse.commitEpoch(spark, dir,
      Seq((7L, "first", 1L)).toDF("k", "name", "load_seq"), 1L)
    AtomicWarehouse.commitNamedEpoch(spark, dir,
      Seq((7L, "second", 1L)).toDF("k", "name", "load_seq"),
      "merge_v1_deadbeef", 1L)
    // engine read: manifest order decides — "second" wins
    val engine = AtomicWarehouse.read(spark, dir, "k")
      .select("name").head.getString(0)
    assert(engine == "second")
    // the connector exposes _pos only when selected
    val withPos = spark.read.format("graft-warehouse").option("path", dir)
      .load().select(col("name"), col("_pos")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(withPos == Map("first" -> 0, "second" -> 1))
    // the documented SQL window matches the engine's winner exactly
    val sql = spark.sql(
      """SELECT name FROM (
        |  SELECT name, row_number() OVER (PARTITION BY k
        |    ORDER BY load_seq DESC, _pos DESC) AS rn FROM whp.ties)
        |WHERE rn = 1""".stripMargin).head.getString(0)
    assert(sql == engine)
  }
}
