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

  test("table arguments are bare identifiers — path traversal refuses") {
    AtomicWarehouse.commitEpoch(spark, s"$root/safe", rows(1, 3, 1L), 1L)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // an escaped path must refuse BEFORE any directory is resolved —
    // vacuum on a traversal argument could irreversibly delete a
    // directory outside the catalog root
    for (bad <- Seq("../safe", "a/b", ".hidden", "..")) {
      val e = intercept[Exception] {
        spark.sql(s"CALL whp.system.vacuum('$bad', 1, 0)").collect()
      }
      assert(msgs(e).exists(_.contains("bare table identifier")),
        s"'$bad': " + msgs(e).take(3).mkString("; "))
    }
  }

  test("CALL system.purge tombstones long keys (compliance sequence)") {
    val dir = s"$root/pg"
    AtomicWarehouse.commitEpoch(spark, dir, rows(1, 30, 1L), 1L,
      statsKey = Some("k"))
    AtomicWarehouse.commitEpoch(spark, dir, rows(20, 40, 2L), 2L,
      statsKey = Some("k"))
    val out = spark.sql(
      "CALL whp.system.purge('pg', array('7', '25'))").collect()
    assert(out.length == 1 && out(0).getInt(0) == 2)
    // deferred: zero epoch rewrites, one tombstone entry
    val names = AtomicWarehouse.committedEpochs(spark, dir)
    assert(names.contains("epoch_1") && names.contains("epoch_2"))
    assert(names.count(_.startsWith("tombstone_")) == 1, names)
    assert(spark.sql("SELECT count(DISTINCT k) AS c FROM whp.pg")
      .head.getLong(0) == 38) // 40 - 2
    // the documented compliance pair finalizes the destruction
    spark.sql("CALL whp.system.compact('pg')")
    spark.sql("CALL whp.system.vacuum('pg', 1, 0)")
    val left = AtomicWarehouse.committedEpochs(spark, dir)
    assert(left.size == 1 && left.head.startsWith("compact_"), left)
    assert(spark.read.parquet(s"$dir/${left.head}")
      .where(col("k").isin(7L, 25L)).isEmpty)
    // non-numeric keys refuse against an integral mergeKey
    val e = intercept[Exception] {
      spark.sql("CALL whp.system.purge('pg', array('VIDx'))").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a long")),
      msgs(e).take(3).mkString("; "))
  }

  test("CALL system.purge tombstones STRING keys per the column type") {
    val r3 = java.nio.file.Files.createTempDirectory("wh_proc_str").toString
    spark.conf.set("spark.sql.catalog.whps",
      "graft.sources.v2.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.whps.root", r3)
    spark.conf.set("spark.sql.catalog.whps.mergeKey", "vid")
    AtomicWarehouse.commitEpoch(spark, s"$r3/v",
      (1 to 6).map(i => (s"VID$i", s"t$i", 1L))
        .toDF("vid", "title", "load_seq"), 1L, statsKey = Some("vid"))
    val out = spark.sql(
      "CALL whps.system.purge('v', array('VID2', 'VID4'))").collect()
    assert(out.length == 1 && out(0).getInt(0) == 2)
    assert(spark.sql("SELECT vid FROM whps.v").as[String].collect().toSet ==
      Set("VID1", "VID3", "VID5", "VID6"))
    assert(AtomicWarehouse.read(spark, s"$r3/v", "vid").count() == 4)
  }
}
