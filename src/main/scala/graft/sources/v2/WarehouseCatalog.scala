package graft.sources.v2

import java.util.{Map => JMap}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sinks.AtomicWarehouse

/** A DSv2 [[TableCatalog]] over a directory of AtomicWarehouses, making
  * every warehouse SQL-addressable with engine-native TIME TRAVEL:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.wh",
  *     "graft.sources.v2.WarehouseCatalog")
  *   spark.conf.set("spark.sql.catalog.wh.root", "/data/warehouses")
  *   spark.sql("SELECT * FROM wh.videos")                  // current
  *   spark.sql("SELECT * FROM wh.videos VERSION AS OF 3")  // manifest v3
  *   spark.sql("SELECT * FROM wh.videos TIMESTAMP AS OF '2024-05-01'")
  * }}}
  *
  * This is the reference's actual ergonomics: its warehouse is a
  * BigQuery TABLE queried by name with server-side time travel (ref:
  * Python-pipeline/ingestdatainbigquery.py:49-76 queries
  * `project.dataset.table`); here the same surface rides on the
  * log-structured parquet warehouse via Spark's own catalog plugin API —
  * `VERSION AS OF` resolves through [[loadTable(Identifier,Long)]]
  * exactly as Delta/Iceberg's catalogs do, and every query through the
  * catalog inherits the [[WarehouseScan]] pruning stack (zone maps,
  * blooms, hive partitions, runtime join filters).
  *
  * Tables are the immediate subdirectories of `root` that hold a
  * `_manifest/`; the catalog is single-namespace (the default), matching
  * the flat dataset the reference keeps. Read-facing by design: writes
  * go through [[AtomicWarehouse]]'s drain/commit protocol (a SQL INSERT
  * could not carry the epoch seq + stats contract), so the mutating
  * catalog hooks refuse with that pointer rather than half-supporting
  * DDL.
  *
  * TIMESTAMP AS OF maps to the newest manifest version whose commit file
  * is not newer than the bound. Manifest files are written once and
  * atomically published, so their modification time IS the commit time
  * (the same approximation Delta's timestamp travel documents: clock
  * skew between writers shifts the boundary, never the content, and
  * [[AtomicWarehouse.vacuum]]'s retention bounds how far back either
  * form can travel). */
class WarehouseCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _
  private var mergeKey: String = ""

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name requires spark.sql.catalog.$name.root = <dir of warehouses>")
    mergeKey = Option(options.get("mergeKey")).getOrElse("")
  }
  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def dirOf(ident: Identifier): String = {
    require(ident.namespace.isEmpty || ident.namespace.sameElements(Array("default")),
      s"catalog $catalogName is single-namespace; got ${ident.namespace.mkString(".")}")
    // a BACKTICKED identifier can smuggle path separators (`` `../x` ``):
    // a table name is a single path segment under the root, never a path
    // — without this, DROP TABLE could delete a directory outside the
    // catalog root
    require(ident.name.nonEmpty && !ident.name.contains("/") &&
        !ident.name.contains("\\") && !ident.name.startsWith("."),
      s"invalid table name '${ident.name}' — a bare identifier (single " +
        "path segment) is required")
    s"$root/${ident.name}"
  }

  private def isWarehouse(dir: String): Boolean =
    fs.exists(new Path(s"$dir/_manifest"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(namespace)
    val rp = new Path(root)
    if (!fs.exists(rp)) Array.empty
    else fs.listStatus(rp).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => isWarehouse(s"$root/$n")).sorted
      .map(Identifier.of(namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    isWarehouse(dirOf(ident))

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (!isWarehouse(dir)) throw new NoSuchTableException(ident)
    val v = version.getOrElse(AtomicWarehouse.currentVersion(spark, dir))
    val conf = WarehouseCatalog.tableConf(fs, dir)
    val committed: StructType =
      WarehouseConnector.snapshotSchema(spark, dir, v)
    // an SQL-created table that has not drained yet serves its DECLARED
    // schema (committed epochs take over as soon as they exist — the
    // declaration is a bootstrap, not a cage: additive evolution applies)
    val schema =
      if (committed.nonEmpty) committed
      else conf.get("schema")
        .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[StructType])
        .getOrElse(committed)
    new WarehouseTable(dir, version, schema,
      conf.getOrElse("mergeKey", mergeKey), conf)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF v` — manifest version v, the catalog form of
    * [[AtomicWarehouse.readVersion]]. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"VERSION AS OF '$version': warehouse versions are manifest numbers"))
    load(ident, Some(v))
  }

  /** `TIMESTAMP AS OF t` (microseconds since epoch, per the DSv2
    * contract): newest manifest committed at or before t. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    if (!isWarehouse(dir)) throw new NoSuchTableException(ident)
    val boundMs = timestamp / 1000L
    val md = new Path(s"$dir/_manifest")
    val versions = fs.listStatus(md).flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && n.endsWith(".json") &&
          st.getModificationTime <= boundMs)
        n.stripPrefix("v").stripSuffix(".json").toLongOption
      else None
    }
    if (versions.isEmpty) throw new NoSuchTableException(ident)
    load(ident, Some(versions.max))
  }

  private def readOnly(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$what: graft warehouses mutate only through AtomicWarehouse's " +
        "drain/commit/compact/vacuum protocol (epoch seq + stats travel " +
        "with the commit), not catalog DDL")

  /** `CREATE TABLE wh.t (k BIGINT, ...) USING graft-warehouse
    * TBLPROPERTIES ('mergeKey'='k', 'statsKey'='k', 'bloomKey'='k',
    * 'zorderBy'='a,b')` — a warehouse born in SQL, the bootstrap every
    * downstream tool expects. Creation is one `_manifest/` mkdir plus an
    * atomically-published `table_conf` recording the declared schema and
    * the write defaults (mergeKey + stats/bloom/cluster/zorder options);
    * subsequent SQL `INSERT INTO wh.t` drains auto-sequenced epochs
    * through the standard staged-commit protocol with those defaults,
    * and SELECT serves the declared schema until the first drain
    * commits. DROP stays refused — destroying data is the vacuum
    * protocol's job, never a DDL side effect. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val provider = Option(properties.get("provider")).getOrElse("")
    if (!provider.equalsIgnoreCase("graft-warehouse"))
      readOnly(s"CREATE TABLE $ident USING $provider")
    require(partitions.isEmpty,
      s"CREATE TABLE $ident: warehouse epochs own their layout " +
        "(clusterBy/zorderBy table properties), not PARTITIONED BY")
    val dir = dirOf(ident)
    if (isWarehouse(dir))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val md = new Path(s"$dir/_manifest")
    fs.mkdirs(md)
    import scala.jdk.CollectionConverters._
    val kept = properties.asScala.view.filterKeys(
      WarehouseCatalog.WriteDefaultKeys).toMap +
      ("schema" -> schema.json)
    try WarehouseCatalog.writeTableConf(fs, dir, kept)
    catch {
      // the exclusive conf publish is the create's linearization point:
      // a racing creator that lost it gets the same error a non-racing
      // duplicate CREATE would
      case _: IllegalStateException =>
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(ident)
    }
    load(ident, None)
  }
  /** `ALTER TABLE t RENAME COLUMN a TO b` / `DROP COLUMN c` — the SQL
    * face of the manifest-level COLUMN MAPPING
    * ([[AtomicWarehouse.renameColumn]]/[[AtomicWarehouse.dropColumn]]):
    * zero data rewrites, a manifest-only directive entry; reads resolve
    * old epochs' physical names through it. Every other ALTER shape
    * stays refused. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isWarehouse(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft-warehouse columns are flat — nested renames unsupported")
        AtomicWarehouse.renameColumn(spark, dir, r.fieldNames()(0), r.newName())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "graft-warehouse columns are flat — nested drops unsupported")
        AtomicWarehouse.dropColumn(spark, dir, d.fieldNames()(0))
      case other => readOnly(s"ALTER TABLE $ident (${other.getClass.getSimpleName})")
    }
    load(ident, None)
  }
  override def dropTable(ident: Identifier): Boolean =
    readOnly(s"DROP TABLE $ident")
  override def renameTable(old: Identifier, to: Identifier): Unit =
    readOnly(s"RENAME TABLE $old")

  /** SQL `CALL <catalog>.system.<verb>(...)` — the maintenance
    * procedures ([[WarehouseProcedures]]): compact, vacuum,
    * describe_history. The verbs call the SAME engine entry points the
    * API exposes; this is their SQL face, completing the SQL-drivable
    * lifecycle (CREATE/INSERT/MERGE/DELETE/SELECT + maintenance). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    WarehouseProcedures.load(root, mergeKey, ident.namespace, ident.name)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    WarehouseProcedures.names
      .map(n => Identifier.of(Array("system"), n)).toArray

  // single flat namespace, reported so SHOW NAMESPACES / resolution work
  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)
  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] =
    if (namespace.isEmpty || namespace.sameElements(Array("default")))
      java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default"))
  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    readOnly(s"CREATE NAMESPACE ${namespace.mkString(".")}")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    readOnly(s"ALTER NAMESPACE ${namespace.mkString(".")}")
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    readOnly(s"DROP NAMESPACE ${namespace.mkString(".")}")
}

object WarehouseCatalog {
  /** Table properties CREATE TABLE persists as write defaults — exactly
    * the connector write options, so `INSERT INTO` drains behave as if
    * every write carried them. */
  val WriteDefaultKeys: Set[String] = Set("mergeKey", "statsKey",
    "statsCols", "bloomKey", "clusterBy", "zorderBy", "writePartitions",
    "compactEvery")

  private def confPath(dir: String) = new Path(s"$dir/_manifest/table_conf")

  /** Publish the table conf atomically AND exclusively (tmp + no-clobber
    * CAS — [[graft.sinks.AtomicWarehouse.casPublish]], the same
    * link/rename-if-absent primitive the manifest commit uses): a torn
    * CREATE can never leave a half-readable conf, and two RACING
    * `CREATE TABLE`s can never both succeed — POSIX `rename(2)` silently
    * replaces an existing destination, so a plain rename would have let
    * both creators "win" with last-writer's conf (possibly a different
    * schema/mergeKey). The loser surfaces as TableAlreadyExists, exactly
    * like a non-racing duplicate CREATE. */
  private[graft] def writeTableConf(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, props: Map[String, String]): Unit = {
    val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
    val body = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}\t${enc(v)}" }.mkString("\n")
    val tmp = new Path(s"$dir/_manifest/.table_conf_tmp_${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!graft.sinks.AtomicWarehouse.casPublish(fs, tmp, confPath(dir)))
      throw new IllegalStateException(
        s"table conf at $dir already published by a concurrent creator")
  }

  /** The persisted table conf, empty for warehouses born outside DDL. */
  private[graft] def tableConf(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Map[String, String] = {
    val p = confPath(dir)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val dec = (s: String) => java.net.URLDecoder.decode(s, "UTF-8")
    body.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split("\t", 2)
      dec(k) -> dec(v)
    }.toMap
  }
}
