package graft.plans

import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import graft.sinks.AtomicWarehouse
import graft.sources.v2.WarehouseTable

/** `UPDATE wh.t SET c = <expr> [, ...] [WHERE <cond>]` on a
  * graft-warehouse catalog table, executed the LOG-STRUCTURED way: the
  * current keyed winners matching the predicate are re-emitted with the
  * assignments applied and committed as ONE appended epoch whose higher
  * `load_seq` wins the last-wins read merge — O(matched rows), never a
  * table rewrite (merge-on-read UPDATE, the companion of
  * [[RewriteWarehouseMerge]]'s MERGE INTO).
  *
  * Unlike DELETE — which is a retraction and therefore key-addressed
  * through the purge/tombstone protocol — an UPDATE only ever APPENDS
  * newer versions, so ARBITRARY deterministic predicates are safe: the
  * matched set is read from the current snapshot (zone-map/bloom pruning
  * applies), and unmatched rows simply have no newer version.
  *
  * Refused shapes (loudly, at analysis):
  *  - assigning the mergeKey (row identity): the old key's latest
  *    version would survive unretracted — that rename is a MERGE INSERT
  *    plus a purge, stated explicitly;
  *  - assigning `load_seq`: system-maintained (maxLoadSeq+1);
  *  - UPDATE of a time-travel view; UPDATE of an empty warehouse.
  *
  * The epoch commits under the collision-free
  * `update_v<base>_<digest>` namespace (digest over the canonicalized
  * predicate + assignments), so only a replay of THIS update at THIS
  * base converges by name — same discipline as MERGE/purge entries.
  *
  * ref: the reference's metric write-back loop updates matched staging
  * rows in place (Python-pipeline/dataprocessing.py:120-163); this is
  * that mutation as SQL against the warehouse, at O(delta) cost. */
object RewriteWarehouseUpdate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u: UpdateTable if u.resolved && isWarehouseTarget(u.table) =>
        rewrite(u)
    }

  private def isWarehouseTarget(t: LogicalPlan): Boolean =
    t.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[WarehouseTable] =>
        r
    }.isDefined

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-warehouse UPDATE supports `SET <dataCol> = <expr>` with " +
        s"any deterministic WHERE over the table's columns — $what")

  private def rewrite(u: UpdateTable): LogicalPlan = {
    val rel = u.table.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[WarehouseTable] => r
    }.get
    val table = rel.table.asInstanceOf[WarehouseTable]
    if (table.mergeKey.isEmpty)
      refuse("the catalog has no mergeKey configured (last-wins row " +
        "identity is what makes an appended UPDATE win)")
    if (table.timeTravelVersion.isDefined)
      refuse("cannot UPDATE a time-travel (VERSION/TIMESTAMP AS OF) view")
    val targetIds = rel.output.map(_.exprId).toSet
    def remap(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.transform {
        case ar: AttributeReference if targetIds.contains(ar.exprId) =>
          UnresolvedAttribute(Seq(ar.name))
      }
    u.condition.foreach { c =>
      if (!c.deterministic)
        refuse("the WHERE predicate must be deterministic (the matched " +
          "set must be replayable)")
    }
    val assigns = u.assignments.map { as =>
      val name = as.key match {
        case ar: AttributeReference => ar.name
        case other => refuse(s"unsupported assignment target: $other")
      }
      if (name == table.mergeKey)
        refuse(s"assigning the mergeKey '$name' renames row identity — " +
          "the old key's latest version would survive; express a rename " +
          "as MERGE INSERT of the new key + DELETE (purge) of the old")
      if (name == "load_seq")
        refuse("load_seq is system-maintained (maxLoadSeq + 1)")
      name -> remap(as.value)
    }.toMap
    if (assigns.isEmpty) refuse("no assignments")
    WarehouseUpdateCommand(table.dir, table.mergeKey,
      rel.output.map(a => a.name -> a.dataType.catalogString),
      MergeBranch(u.condition.map(remap), assigns, srcOnly = false))
  }
}

/** The rewritten UPDATE: reads the current winners under the predicate,
  * applies the assignments, appends ONE epoch at maxLoadSeq+1.
  * Expressions live inside [[MergeBranch]] (hidden from QueryPlan's
  * expression traversal — they hold remapped UnresolvedAttributes). */
final case class WarehouseUpdateCommand(
    dir: String, mergeKey: String,
    targetCols: Seq[(String, String)],
    branch: MergeBranch)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val maxSeq = AtomicWarehouse.maxLoadSeq(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"UPDATE of an empty warehouse at $dir — nothing to update"))
    val newSeq = maxSeq + 1
    val dataCols = targetCols.map(_._1).filter(_ != "load_seq")
    val snap = AtomicWarehouse.read(spark, dir, mergeKey)
    val cond = branch.cond
      .map(c => coalesce(GraftBridge.column(c), lit(false)))
      .getOrElse(lit(true))
    val outCols = dataCols.map { c =>
      branch.assigns.get(c) match {
        case Some(e) => GraftBridge.column(e)
          .cast(targetCols.find(_._1 == c).get._2).as(c)
        case None => col(c)
      }
    } :+ lit(newSeq).as("load_seq")
    val newRows = snap.where(cond).select(outCols: _*)
    val baseV = AtomicWarehouse.currentVersion(spark, dir)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest((branch.cond.map(_.canonicalized.toString).getOrElse("") +
          branch.assigns.toSeq.sortBy(_._1).toString)
        .getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    AtomicWarehouse.commitNamedEpoch(spark, dir, newRows,
      s"update_v${baseV}_$digest", newSeq,
      statsKey = Some(mergeKey), statsCols = Seq("load_seq"),
      bloomKey = Some(mergeKey))
    Nil
  }
}
