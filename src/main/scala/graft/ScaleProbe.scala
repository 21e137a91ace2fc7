package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicate the sf0.1 corpus K× (unique ids; text
  * perturbed per replica so the dup-graph density stays constant instead
  * of exploding quadratically) and measure the heavy operators at 1× vs
  * K×. Near-linear growth is the local evidence for the 100 TB claim:
  * every probed operator's expensive phase is bounded by corpus size (or
  * dup-graph size), never by corpus². Results recorded in BENCH.md.
  *
  * Two modes:
  *  - `docs` (default): documents/embeddings replicas for the dedup/ANN/
  *    text families.
  *  - `tpch`: key-shifted replicas of lineitem/orders/customer/supplier/
  *    part (nation/region stay fixed — real dims don't grow with facts),
  *    i.e. sf1-equivalent volume at K=10, for the h-family. Besides
  *    timing ratios it re-plans every query at K× and flags any
  *    CartesianProduct / BroadcastNestedLoopJoin — the failure mode the
  *    10 MB autoBroadcast threshold can cause when dims outgrow it.
  *
  * Writes only under /tmp; run: `sbt "runMain graft.ScaleProbe [mode] [K]"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.filterNot(_.forall(_.isDigit)).getOrElse("docs")
    val k = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_scale").toString
    if (mode == "tpch") { tpchProbe(spark, sfDir, base, k); spark.stop(); return }
    if (mode == "events") { eventsProbe(spark, sfDir, base, k); spark.stop(); return }
    if (mode == "stream") { streamProbe(spark, sfDir, k); spark.stop(); return }
    if (mode == "densify") { densifyProbe(spark, sfDir, k); spark.stop(); return }
    if (mode == "anndensify") { annDensifyProbe(spark, sfDir, k); spark.stop(); return }
    if (mode == "dml") { dmlProbe(spark, base, k); spark.stop(); return }
    if (mode == "composite") {
      compositeProbe(spark, base, k); spark.stop(); return
    }
    if (mode == "cdc") { cdcProbe(spark, base, k); spark.stop(); return }
    if (mode == "warehouse") { warehouseProbe(spark, sfDir, base, k); spark.stop(); return }
    if (mode == "connector") { connectorProbe(spark, sfDir, base, k); spark.stop(); return }
    if (mode == "manifest") { manifestProbe(spark, base, k); spark.stop(); return }
    if (mode == "foldprofile") { foldProfile(spark, base, k); spark.stop(); return }
    if (mode == "tombstone") { tombstoneProbe(spark, base, k); spark.stop(); return }
    if (mode == "connstream") { connStreamProbe(spark, sfDir, base, k); spark.stop(); return }
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    val emb = Tables.embeddings(spark, sfDir)
    val nVecs = emb.agg(max("vec_id")).head.getLong(0) + 1

    def replicate(df: DataFrame, idCol: String, n: Long,
        perturb: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map { r =>
        val shifted = df.withColumn(idCol, col(idCol) + lit(r * n))
        if (r == 0) shifted else perturb(shifted, r)
      }.reduce(_.unionByName(_))

    // per-replica alphabet rotation rewrites EVERY token, so replicas are
    // independent sub-corpora: the dup graph scales linearly with the
    // corpus (K copies of the same graph) instead of K²-densifying into
    // one giant cross-replica near-dup cluster. (The latter is a valid
    // adversarial probe too — see BENCH.md — but it measures collision
    // density, not corpus growth.)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    replicate(docs, "doc_id", nDocs, (d, r) =>
      d.withColumn("text",
        translate(col("text"), alpha, alpha.drop(r % 26) + alpha.take(r % 26))))
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    // cosine is scale-invariant, so a multiplicative bump would leave
    // replicas as exact semantic dups; a dim-and-replica-dependent offset
    // actually rotates the vector
    replicate(emb, "vec_id", nVecs, (d, r) =>
      d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          x + ((i * r % 13) - 6).cast("float") / 20f)))
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")

    val probes = Seq("d1_exact_dedup", "d2_minhash_signature", "d6_dup_clusters",
      "d14_simhash64_hamming", "d11_segment_dedup",
      "t21_mix_weights", "m3_audio_windows", "v12_semdedup",
      "c1_curation_pipeline",
      // round-2 part-27+ additions (documents/embeddings-only readers)
      "t29_boilerplate_strip", "t32_ngram_novelty", "d19_incremental_dedup",
      "d20_method_agreement", "m7_patch_dedup", "m8_shot_boundaries",
      "v22_ivf_pq_topk", "p11_priority_sample",
      // round-3 additions (documents/embeddings-only readers)
      "t34_bm25", "p12_shard_shuffle",
      "t35_hashed_features", "a25_kmv_union", "p13_quota_sample",
      "p14_weighted_thinning", "v23_residual_adc", "v24_knn_join",
      // round-4 additions (documents-only readers)
      "d22_lsh_bucket_cap", "t37_dsir_importance")

    def timeIt(dir: String, name: String): Double = {
      // steady-state: one untimed warmup, then one timed run
      SparkEntry.queries(name)(spark, dir).count()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"""| query | 1x s | ${k}x s | ratio (linear = $k) |""")
    println("|---|---|---|---|")
    probes.foreach { name =>
      val t1 = timeIt(sfDir, name)
      val tk = timeIt(base, name)
      println(f"| `$name` | $t1%.2f | $tk%.2f | ${tk / t1}%.1f |")
    }
    spark.stop()
  }

  /** Adversarial collision-density probe for the LSH hot-bucket cap:
    * replicate documents K× with id shifts but NO text perturbation, so
    * every LSH bucket gets K× hotter (the degenerate-content failure
    * mode — boilerplate, empty pages — where bucket size grows with the
    * corpus instead of staying flat). Uncapped candidate volume then
    * grows ~K² (Σ|bucket|²); with `maxBucket` the volume must stay FLAT
    * (bucket count is constant, each bounded at the cap). This is the
    * measured evidence that `NearDup.lshCandidatesFromSigs`'s cap turns
    * the quadratic blowup into a constant — recorded in BENCH.md. */
  /** Warehouse-layout probe: K drains of key-DISJOINT customer slices
    * (replica r owns keys (r·N, (r+1)·N]) land as K stats-bearing epochs,
    * then we measure what the manifest features buy at scale:
    *
    *  - snapshot `read` (unions + merges all K epochs) vs `readRange`
    *    over ONE slice's key span (opens 1 epoch out of K via the
    *    min/max stats) — the epoch-skipping payoff, with the scan-list
    *    size printed alongside wall time;
    *  - `compact` cost and the post-compaction snapshot read — the
    *    read-planning payoff of folding a long manifest.
    *
    * At 100 TB the same numbers govern: range reads touch O(slice), not
    * O(warehouse); compaction is a one-time merge that returns reads to
    * single-dir cost. */
  private def warehouseProbe(spark: SparkSession, sfDir: String, base: String,
      k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    val wh = s"$base/wh"
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_mktsegment"))
    val n = cust.agg(max("c_custkey")).head.getLong(0) + 1 // keys are 0-based
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tLoad) = timeIt {
      (0 until k).foreach { r =>
        AtomicWarehouse.commitEpoch(spark, wh,
          cust.withColumn("c_custkey", col("c_custkey") + lit(r * n))
            .withColumn("load_seq", lit(r + 1L)),
          r + 1L, statsKey = Some("c_custkey"))
      }
    }
    val entries = AtomicWarehouse.committedEntriesAt(spark, wh,
      AtomicWarehouse.currentVersion(spark, wh))
    val mid = k / 2
    val (lo, hi) = (mid * n, (mid + 1) * n - 1)
    val scanned = AtomicWarehouse.scanListForRange(entries, "c_custkey", lo, hi).size
    val (full, tFull) = timeIt(AtomicWarehouse.read(spark, wh, "c_custkey").count())
    val (ranged, tRange) = timeIt(
      AtomicWarehouse.readRange(spark, wh, "c_custkey", lo, hi).count())
    val (_, tCompact) = timeIt(AtomicWarehouse.compact(spark, wh, "c_custkey",
      statsKey = Some("c_custkey")))
    val (full2, tFull2) = timeIt(AtomicWarehouse.read(spark, wh, "c_custkey").count())
    println(s"| epochs | load s | full read ($full rows) s | " +
      s"range read ($ranged rows, $scanned/$k epochs opened) s | " +
      s"compact s | post-compact read ($full2 rows) s |")
    println("|---|---|---|---|---|---|")
    println(f"| $k | $tLoad%.2f | $tFull%.2f | $tRange%.2f | $tCompact%.2f | $tFull2%.2f |")
    require(full == full2 && full == k * cust.count(),
      "compaction or replication changed row counts")
  }

  /** MANIFEST-SCALE probe: a 1000-epoch warehouse (2 drains/day is 700+
    * epochs/year; 100 TB means thousands) with TINY epochs — the data is
    * deliberately negligible so every measured cost is the METADATA
    * path: per-commit latency (manifest list + read + CAS write are all
    * O(entries)), manifest parse, driver-side scan-list build, connector
    * planning with pruning, compaction, and vacuum. Milestone rows at
    * k/10, k/3 and k make superlinear growth visible: per-commit cost
    * growing ~linearly in entries is expected (each commit reads and
    * rewrites the manifest), which is exactly why the documented cadence
    * is COMPACT EVERY ~100 EPOCHS — the fold collapses the entry list,
    * returning every O(entries) cost to O(1) while drains continue. */
  private def manifestProbe(spark: SparkSession, base: String, k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    import spark.implicits._
    val wh = s"$base/manifest_wh"
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val rowsPerEpoch = 100
    val milestones = Seq(k / 10, k / 3, k).distinct.filter(_ > 0)
    println("| entries | avg commit ms (last 10) | manifest bytes/entry | " +
      "manifest parse ms | " +
      "scan-list build ms | pruned plan ms (epochs opened) | " +
      "full-read plan ms |")
    println("|---|---|---|---|---|---|---|")
    var committed = 0
    for (m <- milestones) {
      var lastTen = List.empty[Double]
      while (committed < m) {
        val seq = committed + 1L
        val df = spark.range(rowsPerEpoch)
          .select((col("id") + lit(committed * rowsPerEpoch)).as("key"),
            lit(seq).as("load_seq"))
        val (_, t) = timeIt(AtomicWarehouse.commitEpoch(spark, wh, df, seq,
          statsKey = Some("key")))
        lastTen = (t :: lastTen).take(10)
        committed += 1
      }
      val (entries, tParse) = timeIt(AtomicWarehouse.committedEntriesAt(
        spark, wh, AtomicWarehouse.currentVersion(spark, wh)))
      // manifest growth must stay O(cols) bytes per entry — the bound
      // the round-9 default-on multi-column zone maps are capped under
      // (MaxAutoStatsLen string bounds, oversized ones dropped)
      val bytesPerEntry = {
        val p = new org.apache.hadoop.fs.Path(s"$wh/_manifest/" +
          s"v${AtomicWarehouse.currentVersion(spark, wh)}.json")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p).getLen / math.max(1, entries.size)
      }
      val mid = committed / 2
      val (lo, hi) = (mid.toLong * rowsPerEpoch,
        mid.toLong * rowsPerEpoch + rowsPerEpoch - 1)
      val (scanned, tScan) = timeIt(
        AtomicWarehouse.scanListForRange(entries, "key", lo, hi).size)
      // connector PLANNING cost (no execution): analyzed+planned pruned read
      val (openedPruned, tPlanPruned) = timeIt {
        val df = spark.read.format("graft-warehouse").option("path", wh)
          .load().where(col("key").between(lo, hi))
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan.asInstanceOf[graft.sources.v2.WarehouseScan]
              .plannedEpochs().size
        }.head
      }
      val (_, tPlanFull) = timeIt {
        spark.read.format("graft-warehouse").option("path", wh)
          .load().queryExecution.executedPlan
      }
      println(f"| $committed | ${lastTen.sum / lastTen.size * 1000}%.0f | " +
        f"$bytesPerEntry | " +
        f"${tParse * 1000}%.1f | ${tScan * 1000}%.1f | " +
        f"${tPlanPruned * 1000}%.0f ($openedPruned/$committed) | " +
        f"${tPlanFull * 1000}%.0f |")
      require(scanned <= 2, s"zone maps stopped pruning: $scanned epochs")
    }
    // CHANGE FEED at full depth: a consumer 2 versions behind reads
    // O(delta) — planning diffs 2 manifests and lists 2 epochs' files,
    // whatever the table's total size (the incremental-sync story)
    val (cdfRows, tCdf) = timeIt {
      spark.read.format("graft-warehouse").option("path", wh)
        .option("startingVersion", // inclusive: last 2 versions' adds
          (AtomicWarehouse.currentVersion(spark, wh) - 1).toString)
        .load().count()
    }
    require(cdfRows == 2L * rowsPerEpoch,
      s"change feed must serve exactly the 2-epoch delta, got $cdfRows")
    println(f"| change feed, 2 of $k epochs behind: ${tCdf * 1000}%.0f ms " +
      f"($cdfRows rows) |")
    val (_, tCompact) = timeIt(AtomicWarehouse.compact(spark, wh, "key",
      statsKey = Some("key")))
    val (n, tRead) = timeIt(AtomicWarehouse.read(spark, wh, "key").count())
    val (dropped, tVacuum) = timeIt(AtomicWarehouse.vacuum(spark, wh,
      retainVersions = 1, graceMs = 0L))
    println(f"| compact after $k epochs: $tCompact%.1f s | " +
      f"post-compact read ($n rows): $tRead%.1f s | " +
      f"vacuum (${dropped._1} manifests, ${dropped._2} dirs): $tVacuum%.1f s |")
    require(n == k.toLong * rowsPerEpoch, s"row count drifted: $n")
  }

  /** FOLD-COST breakdown at k unfolded epochs: where does a
    * pathologically-deferred compaction's wall time go — the merged
    * READ of k small epochs (k × files-per-epoch tasks), the WRITE of
    * the snapshot, or the commit machinery (stats + manifest CAS)?
    * Run once per shape question; the manifest probe reports only the
    * total. Two epoch shapes: the default 32-files-per-epoch (local[32]
    * range parallelism — the worst case the manifest probe measures)
    * and a single-file variant (`coalesce(1)`) that isolates task-count
    * overhead from entry-count overhead. */
  private def foldProfile(spark: SparkSession, base: String, k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println("| epoch shape | build s | raw multi-root count s | merged-read count s | snapshot write s | full compact s |")
    println("|---|---|---|---|---|---|")
    for ((shape, onePart) <- Seq(("32 files/epoch", false),
        ("1 file/epoch", true))) {
      val wh = s"$base/fp_${if (onePart) 1 else 32}"
      val (_, tBuild) = timeIt {
        (1 to k).foreach { seq =>
          val df0 = spark.range(100).select(
            (col("id") + (seq - 1L) * 100).as("key"),
            lit(seq.toLong).as("load_seq"))
          AtomicWarehouse.commitEpoch(spark, wh,
            if (onePart) df0.coalesce(1) else df0, seq.toLong,
            statsKey = Some("key"))
        }
      }
      // the FAIR baseline: a plain Spark multi-root parquet count over
      // the same dirs — no merge window, no position recovery, no
      // manifest. The engine read can approach but never beat this; the
      // gap between shapes below it is the per-file open/footer floor.
      val (nRaw, tRaw) = timeIt(
        spark.read.parquet(AtomicWarehouse
          .committedEpochs(spark, wh).map(e => s"$wh/$e"): _*).count())
      require(nRaw == k * 100L, s"raw row drift: $nRaw")
      val (n, tCount) = timeIt(
        AtomicWarehouse.read(spark, wh, "key").count())
      require(n == k * 100L, s"row drift: $n")
      val (_, tWrite) = timeIt(
        AtomicWarehouse.read(spark, wh, "key").write
          .mode("overwrite").parquet(s"$wh/_fp_out"))
      val (_, tCompact) = timeIt(
        AtomicWarehouse.compact(spark, wh, "key", statsKey = Some("key")))
      println(f"| $shape | $tBuild%.1f | $tRaw%.1f | $tCount%.1f | " +
        f"$tWrite%.1f | $tCompact%.1f |")
    }
  }

  /** TOMBSTONE-AT-SCALE probe: how does the deferred-purge read path
    * (tombstones applied as ONE broadcast anti-join, see
    * [[graft.sinks.AtomicWarehouse.purgeKeysDeferred]]) behave as the
    * tombstone count T grows over K epochs — and does [[compact]] fold
    * every tombstone away, bounding T by compaction cadence? For each T
    * milestone it measures tombstone-commit latency (must be O(keys),
    * independent of K), merged-read latency, connector plan time, and a
    * PRUNED point read (zone maps must keep pruning data epochs while
    * tombstone key lists ride the broadcast). Tripwires: suppressed-row
    * counts are exact at every T, and the post-compact manifest holds
    * ZERO tombstone entries. */
  private def tombstoneProbe(spark: SparkSession, base: String, k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val wh = s"$base/tomb_wh"
    val rowsPerEpoch = 1000
    (1 to k).foreach { seq =>
      AtomicWarehouse.commitEpoch(spark, wh,
        spark.range(rowsPerEpoch).select(
          (col("id") + (seq - 1L) * rowsPerEpoch).as("key"),
          lit(seq.toLong).as("load_seq")),
        seq.toLong, statsKey = Some("key"))
    }
    val totalRows = k.toLong * rowsPerEpoch
    println(s"| tombstones | keys purged | last tombstone commit ms | " +
      "metadata count ms (rows) | metadata min/max ms (mn,mx) | " +
      "scan read s (rows) | " +
      "connector plan ms | point read ms (epochs) |")
    println("|---|---|---|---|---|---|---|---|")
    var purgedKeys = 0L
    var committedTombs = 0
    val keysPerTomb = 5
    for (t <- Seq(0, k / 20 max 1, k / 2 max 1, k).distinct) {
      var lastCommit = 0.0
      while (committedTombs < t) {
        // 5 keys per tombstone, spread across the key space so every
        // epoch's range overlaps some tombstone (worst case for any
        // per-entry filtering shortcut)
        val lo = (committedTombs.toLong * keysPerTomb * 7919L) % (totalRows - 100)
        val keys = (0 until keysPerTomb)
          .map(i => 100 + (lo + i * 97) % (totalRows - 100)).distinct
        val (n, tc) = timeIt(
          AtomicWarehouse.purgeKeysDeferred(spark, wh, "key", keys))
        purgedKeys += n
        lastCommit = tc
        committedTombs += 1
      }
      val purged = (0 until committedTombs).flatMap { j =>
        val lo = (j.toLong * keysPerTomb * 7919L) % (totalRows - 100)
        (0 until keysPerTomb).map(i => 100 + (lo + i * 97) % (totalRows - 100))
      }.distinct
      val expected = totalRows - purged.size
      val purgedSet = purged.toSet
      val expMin = Iterator.from(0).map(_.toLong).filterNot(purgedSet).next()
      val expMax = Iterator.from(0).map(totalRows - 1 - _)
        .filterNot(purgedSet).next()
      // metadata COUNT: tombstones record newly-suppressed totals at
      // commit, so count(*) stays a manifest subtraction at ANY T — and
      // the equality tripwire validates the suppression bookkeeping
      val (metaRows, tMeta) = timeIt(
        spark.read.format("graft-warehouse").option("path", wh).load()
          .count())
      require(metaRows == expected,
        s"metadata count drifted at T=$committedTombs: $metaRows != $expected")
      // metadata MIN/MAX under tombstones (c70): the exact extremum
      // test keeps epochs clean unless a purged key IS a recorded
      // extremum, so the answer stays a manifest read plus a pruned
      // re-scan of only the tainted epochs — verified EXACT against
      // the purge lattice
      val (mm, tMinMax) = timeIt {
        val r = spark.read.format("graft-warehouse").option("path", wh)
          .load().agg(min(col("key")), max(col("key"))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(mm == (expMin, expMax),
        s"metadata min/max drifted at T=$committedTombs: $mm " +
          s"!= ($expMin, $expMax)")
      // REPEAT at the same version: the session-global memo (keyed by
      // the manifest file's identity) must answer without re-running
      // the T × epochs dirty probes or the dirty rescan — ~flat in T
      val (mm2, tMinMax2) = timeIt {
        val r = spark.read.format("graft-warehouse").option("path", wh)
          .load().agg(min(col("key")), max(col("key"))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(mm2 == mm, s"memoized min/max diverged: $mm2 != $mm")
      val ((rows, planMs), tRead) = timeIt {
        val df = spark.read.format("graft-warehouse").option("path", wh).load()
          // an always-true pushed filter defeats the agg pushdown, so
          // this measures the SCANNED read path the probe always did
          .where(col("key") >= 0L)
        val (_, tPlan) = timeIt(df.queryExecution.executedPlan)
        (df.count(), tPlan * 1000)
      }
      require(rows == expected,
        s"tombstone suppression drifted at T=$committedTombs: $rows != $expected")
      // point read on a key NO tombstone names (keys 0-99 are reserved
      // out of the purge lattice): DATA-epoch pruning must hold at any T
      // — tombstones ride as per-file key-drop lists, never as scanned
      // entries
      val probeKey = 41L
      val (opened, tPoint) = timeIt {
        val df = spark.read.format("graft-warehouse").option("path", wh)
          .load().where(col("key") === probeKey)
        val n = df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan.asInstanceOf[graft.sources.v2.WarehouseScan]
              .plannedEpochs().size
        }.head
        df.count(); n
      }
      require(opened <= 2,
        s"point read stopped pruning under tombstones: $opened data epochs")
      println(f"| $committedTombs | $purgedKeys | ${lastCommit * 1000}%.0f | " +
        f"${tMeta * 1000}%.0f ($metaRows) | " +
        f"${tMinMax * 1000}%.0f/${tMinMax2 * 1000}%.0f ($expMin,$expMax) | " +
        f"$tRead%.1f ($rows) | $planMs%.0f | ${tPoint * 1000}%.0f ($opened) |")
    }
    // compact must FOLD every tombstone away: T is bounded by cadence
    val (_, tCompact) = timeIt(
      AtomicWarehouse.compact(spark, wh, "key", statsKey = Some("key")))
    val after = AtomicWarehouse.committedEntriesAt(spark, wh,
      AtomicWarehouse.currentVersion(spark, wh))
    require(!after.exists(e => AtomicWarehouse.isTombstone(e.name)),
      s"compact left tombstones behind: ${after.map(_.name)}")
    val (n2, tRead2) = timeIt(
      spark.read.format("graft-warehouse").option("path", wh).load().count())
    println(f"| compact folds $k tombstones: $tCompact%.1f s | " +
      f"post-fold read: $tRead2%.1f s ($n2 rows) | manifest entries: " +
      f"${after.size} |")
  }

  /** CONNECTOR-STREAM state probe (the c37/c42 shapes at 10×): tail a
    * warehouse manifest as a stream at K and 10K epochs with admission
    * control, and measure per-batch latency plus the checkpoint offset
    * footprint — the stream's "cursor memory", which must track the
    * VERSION COUNTER (bytes, flat) rather than served volume. */
  private def connStreamProbe(spark: SparkSession, sfDir: String,
      base: String, k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println("| epochs tailed | batches | rows | wall s | s/batch | " +
      "max offset file bytes |")
    println("|---|---|---|---|---|---|")
    for (epochs <- Seq(k, 10 * k)) {
      val wh = s"$base/cs_$epochs"
      (1 to epochs).foreach { seq =>
        AtomicWarehouse.commitEpoch(spark, wh,
          spark.range(50).select(
            (col("id") + (seq - 1L) * 50).as("key"),
            lit(seq.toLong).as("load_seq")),
          seq.toLong, statsKey = Some("key"))
      }
      val ck = s"$base/ck_$epochs"
      val out = s"$base/out_$epochs"
      val (_, wall) = timeIt {
        val q = spark.readStream.format("graft-warehouse")
          .option("path", wh).option("maxVersionsPerBatch", "25")
          .load()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(600000)
      }
      val rows = spark.read.parquet(out).count()
      val offsets = new java.io.File(s"$ck/offsets").listFiles()
      val batches = offsets.length
      val maxOffsetBytes = offsets.map(_.length()).max
      println(f"| $epochs | $batches | $rows | $wall%.1f | " +
        f"${wall / batches}%.2f | $maxOffsetBytes |")
      require(rows == epochs * 50L, s"tail lost rows: $rows")
    }

    // the c37 half: the VIDEO connector's micro-batch stream at 1× and
    // 10× fixture volume, fixed admission (rows/batch) — per-batch
    // latency must stay bounded by the admission cap and the offset (a
    // row index) must stay flat in bytes while volume grows 10×
    println("| video rows | batches | wall s | s/batch | " +
      "max offset file bytes |")
    println("|---|---|---|---|---|")
    for (mult <- Seq(1, 10)) {
      val dir = s"$base/vids_$mult"
      val li = Tables.lineitem(spark, sfDir).limit(20000 * mult)
      li.select(
          concat(lit("v"), monotonically_increasing_id().cast("string"))
            .as("video_id"),
          concat(col("l_returnflag"), lit("-"), col("l_linestatus"))
            .as("video_title"),
          date_format(col("l_shipdate").cast("timestamp"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("published_at"),
          concat(lit("ch"), (col("l_suppkey") % 7).cast("string"))
            .as("channel_id"),
          monotonically_increasing_id().as("ingest_seq"))
        .repartition(4)
        .write.format("graft-videos").option("path", dir)
        .mode("append").save()
      val total = spark.read.format("graft-videos").option("path", dir)
        .load().count()
      val ck = s"$base/vck_$mult"; val out = s"$base/vout_$mult"
      val (_, wall) = timeIt {
        val q = spark.readStream.format("graft-videos").option("path", dir)
          .option("maxRowsPerBatch", "5000")
          .load()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(600000)
      }
      val rows = spark.read.parquet(out).count()
      val offsets = new java.io.File(s"$ck/offsets").listFiles()
      println(f"| $total | ${offsets.length} | $wall%.1f | " +
        f"${wall / offsets.length}%.2f | ${offsets.map(_.length()).max} |")
      require(rows == total, s"video tail lost rows: $rows of $total")
    }
  }

  /** graft-warehouse CONNECTOR probe: does a plain Catalyst `.where`
    * through the DSv2 scan prune I/O the way the explicit readRange API
    * does, and what does the DSv2 write path cost vs commitEpoch? K
    * key-disjoint epochs (each a full customer copy, shifted) are
    * written THROUGH `df.write.format("graft-warehouse")`, then read
    * back via `spark.read` with (a) no filter, (b) a one-epoch key
    * range, (c) a single-key point lookup (bloom path). Timings + the
    * epochs-opened counts print as a BENCH.md row. */
  private def connectorProbe(spark: SparkSession, sfDir: String, base: String,
      k: Int): Unit = {
    val wh = s"$base/whc"
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("k"), col("c_name"),
        col("c_mktsegment"))
    val n = cust.agg(max("k")).head.getLong(0) + 1
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tWrite) = timeIt {
      (0 until k).foreach { r =>
        cust.withColumn("k", col("k") + lit(r * n))
          .withColumn("load_seq", lit(r + 1L))
          .write.format("graft-warehouse")
          .option("path", wh).option("seq", (r + 1L).toString)
          .option("statsKey", "k").option("bloomKey", "k")
          .mode("append").save()
      }
    }
    def read() = spark.read.format("graft-warehouse").option("path", wh).load()
    def epochsOpened(df: org.apache.spark.sql.DataFrame): Int = {
      def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
        p.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            Seq(b.scan.asInstanceOf[graft.sources.v2.WarehouseScan]
              .plannedEpochs().size)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            find(a.executedPlan)
        }.flatten
      find(df.queryExecution.executedPlan).head
    }
    val (full, tFull) = timeIt(read().count())
    val mid = k / 2
    val rq = read().where(col("k").between(mid * n, (mid + 1) * n - 1))
    val (ranged, tRange) = timeIt(rq.count())
    val pq = read().where(col("k") === (mid * n + 7))
    val (point, tPoint) = timeIt(pq.count())
    println(s"| epochs | dsv2 write s | full read ($full rows) s | " +
      s"range read ($ranged rows, ${epochsOpened(rq)}/$k epochs) s | " +
      s"point read ($point rows, ${epochsOpened(pq)}/$k epochs) s |")
    println("|---|---|---|---|---|")
    println(f"| $k | $tWrite%.2f | $tFull%.2f | $tRange%.2f | $tPoint%.2f |")
    require(full == k * cust.count(), "connector write/read changed row counts")

    // CLUSTERED vs UNCLUSTERED single-epoch layout: k× the customer
    // rows in ONE epoch, written shuffled vs clusterBy — a narrow key
    // slice must get cheaper from row-group skipping alone (same epoch
    // count, same file count: the only variable is layout)
    val big = (0 until k).map(r =>
        cust.withColumn("k", col("k") + lit(r * n)))
      .reduce(_.unionByName(_))
      .withColumn("load_seq", lit(1L))
      .withColumn("__r", expr("md5(cast(k as string))"))
      .repartition(8, col("__r")).drop("__r")
    def writeOne(path: String, clustered: Boolean): Double = {
      val w = big.write.format("graft-warehouse")
        .option("path", path).option("seq", "1")
        .option("writePartitions", "8")
      timeIt((if (clustered) w.option("clusterBy", "k") else w)
        .mode("append").save())._2
    }
    val tPlain = writeOne(s"$base/plain", clustered = false)
    val tClustered = writeOne(s"$base/clustered", clustered = true)
    def slice(path: String): Double = timeIt(
      spark.read.format("graft-warehouse").option("path", path).load()
        .where(col("k").between(mid * n, mid * n + 999)).count())._2
    val (tSlicePlain, tSliceClustered) = (slice(s"$base/plain"),
      slice(s"$base/clustered"))
    println(s"| layout | write s | 1000-key slice read s |")
    println("|---|---|---|")
    println(f"| shuffled | $tPlain%.2f | $tSlicePlain%.2f |")
    println(f"| clusterBy k | $tClustered%.2f | $tSliceClustered%.2f |")
  }

  private def densifyProbe(spark: SparkSession, sfDir: String, k: Int): Unit = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    val dense = (0 until k).map(r =>
        docs.withColumn("doc_id", col("doc_id") + lit(r * nDocs)))
      .reduce(_.unionByName(_)).localCheckpoint(true)

    def run(d: DataFrame, cap: Int): (Long, Double) = {
      def once(): Long =
        text.NearDup.lshCandidates(d, "doc_id", col("text"), 3, 8, 8, cap).count()
      once() // warmup
      val t0 = System.nanoTime()
      val n = once()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    println(s"| corpus | cap | candidate pairs | s |")
    println("|---|---|---|---|")
    for ((label, d) <- Seq("1x" -> docs, s"${k}x" -> dense);
         cap <- Seq(Int.MaxValue, 5)) {
      val (n, t) = run(d, cap)
      val capStr = if (cap == Int.MaxValue) "none" else cap.toString
      println(f"| $label | $capStr | $n%d | $t%.2f |")
    }
  }

  /** ANN densification probe — the [[graft.vec.Similarity.lshTopK]] twin
    * of `densify`: K id-shifted replicas of a CONSTANT-vector corpus, so
    * every vector of every replica lands in the SAME (tbl, bucket) of
    * every hash table and the corpus-side of the candidate join is one
    * saturated bucket. Self-ANN (queries = corpus, the v24 kNN-join
    * shape) makes uncapped candidate volume quadratic in corpus size;
    * the md5-ranked `maxBucket` cap bounds it at
    * O(corpus × tables × cap). Candidates are counted by running the
    * full pipeline with an unbounded k (every scored pair survives). */
  private def annDensifyProbe(spark: SparkSession, sfDir: String,
      k: Int): Unit = {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val nVecs = emb.agg(max("vec_id")).head.getLong(0) + 1
    val const = emb.withColumn("embedding",
      transform(col("embedding"), _ => lit(0.5f)))
    val dense = (0 until k).map(r =>
        const.withColumn("vec_id", col("vec_id") + lit(r * nVecs)))
      .reduce(_.unionByName(_)).localCheckpoint(true)

    def run(d: DataFrame, cap: Int): (Long, Double) = {
      def once(): Long = vec.Similarity.lshTopK(d, d, "vec_id", "embedding",
        k = Int.MaxValue, dims = 64, planes = 3, tables = 4,
        maxBucket = cap).count()
      once() // warmup
      val t0 = System.nanoTime()
      val n = once()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    println(s"| corpus | cap | candidate pairs | s |")
    println("|---|---|---|---|")
    for ((label, d) <- Seq("1x" -> const.localCheckpoint(true),
           s"${k}x" -> dense);
         cap <- Seq(Int.MaxValue, 16)) {
      val (n, t) = run(d, cap)
      val capStr = if (cap == Int.MaxValue) "none" else cap.toString
      println(f"| $label | $capStr | $n%d | $t%.2f |")
    }
  }

  /** CDC REPLICATION at scale: maintain a MIRROR warehouse from the
    * source's row-level change feed ([[graft.ops.Merge
    * .replicateChangeFeedBatch]] — the c78 loop, batch-driven) while
    * the source grows through K delta rounds, and compare the
    * per-delta apply cost against the reference's refresh loop (full
    * re-read + full rewrite — ref: Python-pipeline/
    * ingestdatainbigquery.py:84-96). The claim: apply cost is
    * O(delta) — ~flat as the table grows — because the feed plans
    * O(versions in range), deletes ride as key-list metadata, and the
    * mirror write is one epoch of batch winners. Every 5th round adds
    * a deferred purge (100 keys) and every 7th a COPY-ON-WRITE purge
    * (20 keys, served through the purge log), so the retraction path
    * is exercised continuously, not once. Ends with a full symmetric-
    * except equality tripwire and the full-refresh loop timed on the
    * same final state. */
  private def cdcProbe(spark: SparkSession, base: String, k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val src = s"$base/cdc_src"
    val mir = s"$base/cdc_mirror"
    val initRows = 2000000L
    val deltaRows = 5000L
    AtomicWarehouse.commitEpoch(spark, src,
      spark.range(initRows).select(col("id").as("key"),
        concat(lit("v"), col("id")).as("name"), lit(1L).as("load_seq")),
      1L, statsKey = Some("key"), bloomKey = Some("key"))
    var served = 0L
    def applyDelta(): Double = {
      val cur = AtomicWarehouse.currentVersion(spark, src)
      if (cur <= served) return 0.0
      val (_, t) = timeIt {
        val feed = spark.read.format("graft-warehouse").option("path", src)
          .option("startingVersion", (served + 1).toString)
          .option("endingVersion", cur.toString)
          .option("readChangeFeed", "true").load()
          .select(col("*"), col("_pos"))
        graft.ops.Merge.replicateChangeFeedBatch(feed, cur, mir, "key")
      }
      served = cur
      t
    }
    val t0 = applyDelta() // round 0: the initial snapshot
    println("| round | source rows (meta) | delta apply s | note |")
    println("|---|---|---|---|")
    println(f"| 0 | $initRows | $t0%.2f | initial snapshot |")
    var nextKey = initRows
    for (r <- 1 to k) {
      val seq = (r + 1).toLong
      // distinct update keys: a fixed stride over the live key space
      val stride = math.max(1L, nextKey / (deltaRows / 2))
      val upd = spark.range(deltaRows / 2).select(
        (col("id") * stride).as("key"),
        concat(lit(s"u${r}_"), col("id")).as("name"),
        lit(seq).as("load_seq"))
      val ins = spark.range(deltaRows / 2).select(
        (col("id") + nextKey).as("key"),
        concat(lit(s"n${r}_"), col("id")).as("name"),
        lit(seq).as("load_seq"))
      AtomicWarehouse.commitEpoch(spark, src, upd.unionByName(ins), seq,
        statsKey = Some("key"), bloomKey = Some("key"))
      nextKey += deltaRows / 2
      var note = "delta (2.5k upd + 2.5k ins)"
      if (r % 5 == 0) {
        AtomicWarehouse.purgeKeysDeferred(spark, src, "key",
          (1 to 100).map(i => (r * 1009L + i * 131L) % initRows).distinct)
        note += " + deferred purge(100)"
      }
      if (r % 7 == 0) {
        AtomicWarehouse.purgeKeys(spark, src, "key",
          (1 to 20).map(i => (r * 2003L + i * 173L) % initRows).distinct,
          statsKey = Some("key"), bloomKey = Some("key"))
        note += " + CoW purge(20)"
      }
      val t = applyDelta()
      val srcRows = spark.read.format("graft-warehouse").option("path", src)
        .load().count() // metadata answer (manifest counts − supp)
      println(f"| $r | $srcRows | $t%.2f | $note |")
    }
    // mirror ≡ source, row-identical
    val a = AtomicWarehouse.read(spark, src, "key")
      .select("key", "name", "load_seq")
    val b = AtomicWarehouse.read(spark, mir, "key")
      .select("key", "name", "load_seq")
    val (diff, tCmp) = timeIt(
      b.exceptAll(a).count() + a.exceptAll(b).count())
    require(diff == 0L, s"mirror diverged from source by $diff rows")
    println(f"| mirror == source | symmetric except = 0 | $tCmp%.1f | tripwire |")
    // the reference's loop on the same end state: read EVERYTHING,
    // rewrite the whole mirror
    val (_, tFull) = timeIt {
      AtomicWarehouse.commitEpoch(spark, s"$base/cdc_full",
        AtomicWarehouse.read(spark, src, "key"), 1L,
        statsKey = Some("key"))
    }
    println(f"| FULL refresh (reference loop) | n/a | $tFull%.2f | " +
      "read-everything + rewrite |")
  }

  /** SQL DML at manifest depth: a K-epoch warehouse (1000 rows each,
    * disjoint key ranges, zone maps + blooms), then the round-12 DML
    * verbs timed against it — the claim under test is that a KEY-BOUND
    * `UPDATE` rides the pruned point-read path (opens ~1 epoch however
    * deep the manifest) while a predicate UPDATE/DELETE pays one honest
    * matched-slice scan, and every verb appends O(delta) metadata
    * rather than rewriting the store. */
  private def dmlProbe(spark: SparkSession, base: String, k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val root = s"$base/dml"
    spark.conf.set("spark.sql.catalog.whdml",
      "graft.sources.v2.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.whdml.root", root)
    spark.conf.set("spark.sql.catalog.whdml.mergeKey", "key")
    val dir = s"$root/t"
    val rowsPerEpoch = 1000
    (1 to k).foreach { seq =>
      AtomicWarehouse.commitEpoch(spark, dir,
        spark.range(rowsPerEpoch).select(
          (col("id") + (seq - 1L) * rowsPerEpoch).as("key"),
          concat(lit("name"), col("id")).as("name"),
          lit(seq.toLong).as("load_seq")),
        seq.toLong, statsKey = Some("key"), bloomKey = Some("key"))
    }
    val total = k.toLong * rowsPerEpoch
    println("| verb | wall s | note |")
    println("|---|---|---|")
    // KEY-BOUND UPDATE: point-read path (blooms open ~1 epoch)
    val (_, tPoint) = timeIt(spark.sql(
      s"UPDATE whdml.t SET name = 'point' WHERE key = ${total / 2}"))
    println(f"| UPDATE WHERE key = x | $tPoint%.2f | pruned point read |")
    // verify + entries audit
    require(spark.sql(
      s"SELECT name FROM (SELECT name, load_seq, row_number() OVER " +
        s"(PARTITION BY key ORDER BY load_seq DESC) rn FROM whdml.t " +
        s"WHERE key = ${total / 2}) WHERE rn = 1").head.getString(0)
      == "point")
    // PREDICATE UPDATE: one matched-slice scan, O(matched) append
    val (_, tPred) = timeIt(spark.sql(
      "UPDATE whdml.t SET name = concat(name, '!') WHERE key % 1000 = 7"))
    println(f"| UPDATE WHERE key %% 1000 = 7 ($k rows) | $tPred%.2f | " +
      "matched-slice scan |")
    // PREDICATE DELETE: matched keys -> one tombstone
    val (_, tDel) = timeIt(spark.sql(
      "DELETE FROM whdml.t WHERE key % 1000 = 13"))
    println(f"| DELETE WHERE key %% 1000 = 13 ($k keys) | $tDel%.2f | " +
      "deferred tombstone |")
    // the connector COUNT is the LOG view (every version) minus
    // tombstone suppression: 400k base + 1 point-update version + k
    // predicate-update versions − k suppressed single-version keys
    val (n, tCount) = timeIt(spark.sql(
      "SELECT count(*) FROM whdml.t").head.getLong(0))
    require(n == total + 1, s"count after delete: $n != ${total + 1}")
    println(f"| COUNT(*) after delete | $tCount%.2f | manifest answer |")
    val names = AtomicWarehouse.committedEpochs(spark, dir)
    println(s"| manifest | ${names.size} entries | " +
      s"${names.count(_.startsWith("update_v"))} update epochs, " +
      s"${names.count(AtomicWarehouse.isTombstone)} tombstones |")
  }

  /** COMPOSITE-KEY probe (round 14): a warehouse keyed `grp,id` at K
    * epochs, each epoch one `grp` partition of 1000 ids — the layout a
    * real multi-tenant drain produces. Measures (a) the key-bound
    * composite UPDATE/DELETE point path — per-part zone maps + blooms
    * must open ~1 epoch regardless of K, pinned by the scan-list count
    * — against (b) the unbounded-predicate scan path that reads the
    * merged store, and (c) the composite change feed end-to-end. The
    * point verbs staying flat while K grows is the 100 TB evidence:
    * depth costs the manifest read, never the data. */
  private def compositeProbe(spark: SparkSession, base: String,
      k: Int): Unit = {
    import graft.sinks.AtomicWarehouse
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val root = s"$base/cmp"
    spark.conf.set("spark.sql.catalog.whcmp",
      "graft.sources.v2.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.whcmp.root", root)
    spark.conf.set("spark.sql.catalog.whcmp.mergeKey", "grp,id")
    val dir = s"$root/t"
    val rowsPerEpoch = 1000
    (1 to k).foreach { seq =>
      AtomicWarehouse.commitEpoch(spark, dir,
        spark.range(rowsPerEpoch).select(
          lit(s"g$seq").as("grp"), col("id"),
          concat(lit("name"), col("id")).as("name"),
          lit(seq.toLong).as("load_seq")),
        seq.toLong, statsKey = Some("grp,id"), bloomKey = Some("grp,id"))
    }
    val total = k.toLong * rowsPerEpoch
    println(s"composite probe: $k epochs x $rowsPerEpoch rows " +
      s"($total rows, mergeKey grp,id)")
    println("| verb | wall s | epochs opened | note |")
    println("|---|---|---|---|")
    val entries = AtomicWarehouse.committedEpochs(spark, dir)
    val allEntries = graft.sinks.AtomicWarehouse
      .committedEntriesAt(spark, dir,
        AtomicWarehouse.currentVersion(spark, dir))
    val mid = k / 2 + 1
    val opened = AtomicWarehouse.scanListForPointTyped(allEntries,
      "grp,id", "string",
      "g" + mid + AtomicWarehouse.CompositeSep + "500").size
    val (_, tPoint) = timeIt(spark.sql(
      s"UPDATE whcmp.t SET name = 'point' WHERE grp = 'g$mid' AND id = 500"))
    println(f"| UPDATE WHERE grp='g$mid' AND id=500 | $tPoint%.2f | " +
      s"$opened of ${entries.size} | per-part pruned point read |")
    require(spark.sql(
      s"SELECT name FROM (SELECT name, load_seq, row_number() OVER " +
        s"(PARTITION BY grp, id ORDER BY load_seq DESC) rn FROM whcmp.t " +
        s"WHERE grp = 'g$mid' AND id = 500) WHERE rn = 1").head.getString(0)
      == "point")
    val (_, tScan) = timeIt(spark.sql(
      "UPDATE whcmp.t SET name = concat(name, '!') WHERE id % 1000 = 7"))
    println(f"| UPDATE WHERE id %% 1000 = 7 | $tScan%.2f | all | " +
      "unbounded predicate: merged scan |")
    val (_, tDel) = timeIt(spark.sql(
      s"DELETE FROM whcmp.t WHERE grp = 'g$mid' AND id IN (1, 2, 3)"))
    println(f"| DELETE 3 composite keys | $tDel%.2f | $opened | " +
      "point-read matched slice -> one tombstone |")
    val (nDel, tFeed) = timeIt(spark.read.format("graft-warehouse")
      .option("path", dir).option("startingVersion", "1")
      .option("readChangeFeed", "true").load()
      .where(col("_change_type") === "delete").count())
    require(nDel == 3L, s"feed delete rows: $nDel")
    println(f"| CDF feed (delete rows) | $tFeed%.2f | - | " +
      "composite delete rows carry both parts |")
  }

  /** Events-family probe: K id-shifted replicas of the events table —
    * replica users are NEW users with identical temporal patterns, so
    * per-user operators (interval islands, as-of) see K× independent
    * series and per-type series (CUSUM) see K× counts in the same number
    * of groups. The ts column round-trips whichever format the source
    * testdata shipped in: INT64 nanos is read raw (long, under
    * nanosAsLong) and written back as plain INT64 for Tables.events'
    * div-1000 rebuild, while TIMESTAMP_NTZ testdata replicates as NTZ and
    * is handled by Tables.events' schema branch on read. */
  private def eventsProbe(spark: SparkSession, sfDir: String, base: String,
      k: Int): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val nE = ev.agg(max("event_id")).head.getLong(0) + 1
    val nU = ev.agg(max("user_id")).head.getLong(0) + 1
    (0 until k).map { r =>
      ev.withColumn("event_id", col("event_id") + lit(r * nE))
        .withColumn("user_id", col("user_id") + lit(r * nU))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$base/events.parquet")

    val probes = Seq("e41_interval_merge", "e42_cusum_changepoint",
      "g14_random_walks", "e38_asof_forward", "e39_twap")

    def timeIt(dir: String, name: String): Double = {
      SparkEntry.queries(name)(spark, dir).count() // warmup
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"""| query | 1x s | ${k}x s | ratio (linear = $k) |""")
    println("|---|---|---|---|")
    probes.foreach { name =>
      val t1 = timeIt(sfDir, name)
      val tk = timeIt(base, name)
      println(f"| `$name` | $t1%.2f | $tk%.2f | ${tk / t1}%.1f |")
    }
  }

  /** STREAMING-ENGINE state probe: replay the events table through the
    * ENGINE paths (the c4–c28 battery family's operators) at 1× and K×
    * TRAFFIC — replicas keep the SAME user keys and time range, so the
    * claim under test is exactly "state is bounded by keys/watermark,
    * never by replayed volume": watermark dedup and timer sessionization
    * must hold state ~flat while input grows K×, the window aggregate's
    * state is open-windows×types (time-range-bound), and the interval
    * join retains only rows inside the watermark horizon. For each
    * operator we record micro-batch count, the MAX state-store row count
    * across the run (`stateOperators.numRowsTotal` from query progress —
    * measured, not asserted), and wall time. Recorded in BENCH.md. */
  private def streamProbe(spark: SparkSession, sfDir: String, k: Int): Unit = {
    import spark.implicits._
    import graft.streaming.EventStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev1 = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
        col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val nE = ev1.map(_._2).max + 1
    // K× TRAFFIC: distinct event ids, same users, ts jittered inside the
    // same range (replica r shifts by r µs — still duplicate-dense)
    def replay(rep: Int): IndexedSeq[(Long, Long, Long, String, Double)] =
      (0 until rep).flatMap(r => ev1.map(e =>
        (e._1 + r, e._2 + r * nE, e._3, e._4, e._5)))
        .sortBy(x => (x._1, x._2)).toIndexedSeq

    final case class Probe(name: String,
        build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
    val probes = Seq(
      Probe("dedupStream (watermark dedup)",
        df => EventStream.dedupStream(df, "400 days")
          .select("event_id", "user_id")),
      Probe("windowedAgg (1h windows, 4d watermark)",
        df => EventStream.windowedAgg(df)),
      Probe("sessionizeTimers (event-time timers)",
        df => EventStream.sessionizeTimers(
          df.select(col("user_id"), col("event_id"), col("ts"))
            .as[EventStream.TimedEvent],
          watermarkDelay = "0 seconds").toDF()),
      Probe("clickErrorJoin (interval join)",
        df => EventStream.clickErrorJoin(
          df.where(col("event_type") === "click"),
          df.where(col("event_type") === "error"))))

    println("| engine path | vol | batches | max state rows | out rows | sec |")
    println("|---|---|---|---|---|---|")
    for (rep <- Seq(1, k); p <- probes) {
      val rows = replay(rep)
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Long, String, Double)]
      val stream = source.toDF()
        .toDF("us", "event_id", "user_id", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("us")))
      val sinkName = s"probe_${p.name.takeWhile(_ != ' ')}_$rep"
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = p.build(stream).writeStream.format("memory")
          .queryName(sinkName).outputMode("append").start()
        var maxState = 0L; var batches = 0
        val t0 = System.nanoTime()
        try {
          rows.grouped((rows.length + 7) / 8).foreach { chunk =>
            source.addData(chunk)
            q.processAllAvailable()
            val pr = q.lastProgress
            if (pr != null) {
              maxState = math.max(maxState,
                pr.stateOperators.asScala.map(_.numRowsTotal).sum)
              batches += 1
            }
          }
        } finally q.stop()
        val sec = (System.nanoTime() - t0) / 1e9
        val out = spark.table(sinkName).count()
        println(f"| ${p.name} | ${rep}x | $batches | $maxState | $out | $sec%.2f |")
        spark.catalog.dropTempView(sinkName)
      } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
  }

  private implicit class RichArr[T](a: Array[T]) {
    def asScala: Seq[T] = scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }

  /** TPC-H-family probe: K key-shifted replicas of the 5 growing tables
    * (foreign keys shifted consistently so join selectivity per replica
    * is preserved), fixed nation/region. */
  private def tpchProbe(spark: SparkSession, sfDir: String, base: String,
      k: Int): Unit = {
    def shift(df: DataFrame, keyUnits: Map[String, Long]): DataFrame =
      (0 until k).map { r =>
        keyUnits.foldLeft(df) { case (d, (c, unit)) =>
          d.withColumn(c, col(c) + lit(r * unit))
        }
      }.reduce(_.unionByName(_))

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1

    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val nOrd = maxOf(ord, "o_orderkey"); val nCust = maxOf(cust, "c_custkey")
    val nSupp = maxOf(supp, "s_suppkey"); val nPart = maxOf(part, "p_partkey")

    shift(li, Map("l_orderkey" -> nOrd, "l_partkey" -> nPart, "l_suppkey" -> nSupp))
      .write.mode("overwrite").parquet(s"$base/lineitem.parquet")
    shift(ord, Map("o_orderkey" -> nOrd, "o_custkey" -> nCust))
      .write.mode("overwrite").parquet(s"$base/orders.parquet")
    shift(cust, Map("c_custkey" -> nCust))
      .write.mode("overwrite").parquet(s"$base/customer.parquet")
    shift(supp, Map("s_suppkey" -> nSupp))
      .write.mode("overwrite").parquet(s"$base/supplier.parquet")
    shift(part, Map("p_partkey" -> nPart))
      .write.mode("overwrite").parquet(s"$base/part.parquet")
    // real dimensions don't grow with the fact tables
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$base/$t.parquet")
    }

    val probes = (1 to 22).map(i => s"h$i").flatMap { p =>
      SparkEntry.queries.keys.find(_.startsWith(p + "_"))
    } ++ Seq( // round-3 layout/skew operators (tpch-table readers)
      "c9_bucketed_join", "j13_salted_skew_join", "c10_zorder_curve",
      "w16_skyline", "g15_kcore", "a24_freq_quantiles",
      "c11_incremental_rollup")

    def timeIt(dir: String, name: String): Double = {
      SparkEntry.queries(name)(spark, dir).count() // warmup
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // a BNLJ that exists at BOTH scales is a deliberate one-row scalar
    // crossJoin(broadcast(...)); only NEW occurrences at Kx are flips
    def opCounts(dir: String, name: String): Map[String, Int] = {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .map(op => op -> op.r.findAllIn(plan).length).toMap
    }

    println(f"""| query | 1x s | ${k}x s | ratio (linear = $k) | plan flips at ${k}x |""")
    println("|---|---|---|---|---|")
    probes.foreach { name =>
      val t1 = timeIt(sfDir, name)
      val tk = timeIt(base, name)
      val c1 = opCounts(sfDir, name); val ck = opCounts(base, name)
      val flips = ck.collect { case (op, n) if n > c1(op) => s"$op +${n - c1(op)}" }
      val flagStr = if (flips.isEmpty) "none" else flips.mkString(", ")
      println(f"| `$name` | $t1%.2f | $tk%.2f | ${tk / t1}%.1f | $flagStr |")
    }
  }
}
