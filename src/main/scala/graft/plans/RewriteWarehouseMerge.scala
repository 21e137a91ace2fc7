package graft.plans

import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import graft.sinks.AtomicWarehouse
import graft.sources.v2.WarehouseTable

/** `MERGE INTO wh.t USING updates s ON t.key = s.key WHEN MATCHED THEN
  * UPDATE ... WHEN NOT MATCHED THEN INSERT ...` on a graft-warehouse
  * catalog table — the SQL face of the reference's K4 scatter-update
  * (ref: Python-pipeline/dataprocessing.py:120-163 writes fetched
  * metrics back into matched staging rows), executed the LOG-STRUCTURED
  * way: the merge result is ONE appended epoch whose rows win the keyed
  * last-wins read merge by `load_seq`, so merge cost is O(delta), never
  * a table rewrite — what Delta/Iceberg call a merge-on-read MERGE.
  *
  * Supported shape (everything else refuses at analysis, naming the
  * violation — half-running a MERGE would corrupt the upsert contract):
  *
  *  - the ON condition is `t.<mergeKey> = <expr over source>` (the
  *    catalog's configured mergeKey: row identity is what the warehouse
  *    merges by);
  *  - WHEN MATCHED: at most one, unconditional `UPDATE SET ...` whose
  *    values reference only source columns (unassigned columns keep the
  *    matched row's current value — fetched via one pre-merge read);
  *  - WHEN NOT MATCHED: at most one, unconditional `INSERT ...`
  *    (unassigned columns insert NULL);
  *  - WHEN NOT MATCHED BY SOURCE: unsupported (its delete/update forms
  *    address rows by ABSENCE, which an append cannot express);
  *  - `load_seq` is system-maintained: the new epoch's sequence number
  *    overrides any assignment to it (drains set load_seq = epoch seq;
  *    MERGE follows the same convention so its rows win the merge).
  *
  * Execution picks between two plans:
  *
  *  - FAST PATH (`UPDATE SET *` / full assignment lists where matched
  *    and not-matched values coincide): the source projection IS the
  *    epoch — no target read at all, O(|source|);
  *  - GENERAL PATH (partial assignments or asymmetric branches): one
  *    left-outer join of the source against the current merged snapshot
  *    supplies old values for unassigned columns and the matched/not-
  *    matched branch per row; rows with no applicable action drop out.
  *    The delta-sized source is the join's small side.
  */
object RewriteWarehouseMerge extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved && isWarehouseTarget(m) =>
        rewrite(m)
    }

  private def isWarehouseTarget(m: MergeIntoTable): Boolean =
    m.targetTable.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[WarehouseTable] =>
        r
    }.isDefined

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-warehouse MERGE INTO supports only `ON t.<mergeKey> = " +
        "<source expr>` with one unconditional WHEN MATCHED THEN UPDATE " +
        "and/or one unconditional WHEN NOT MATCHED THEN INSERT, values " +
        s"over source columns only — $what")

  private def rewrite(m: MergeIntoTable): LogicalPlan = {
    val rel = m.targetTable.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[WarehouseTable] => r
    }.get
    val table = rel.table.asInstanceOf[WarehouseTable]
    if (table.mergeKey.isEmpty)
      refuse("the catalog has no mergeKey configured")
    if (table.timeTravelVersion.isDefined)
      refuse("cannot MERGE into a time-travel (VERSION/TIMESTAMP AS OF) view")
    val targetAttrs = rel.output
    val sourceRefs = m.sourceTable.outputSet

    // ON t.<mergeKey> = <source expr> (either side order)
    val srcKeyExpr: Expression = m.mergeCondition match {
      case EqualTo(l: AttributeReference, r)
          if targetAttrs.exists(_.exprId == l.exprId) &&
            l.name == table.mergeKey && r.references.subsetOf(sourceRefs) => r
      case EqualTo(l, r: AttributeReference)
          if targetAttrs.exists(_.exprId == r.exprId) &&
            r.name == table.mergeKey && l.references.subsetOf(sourceRefs) => l
      case other => refuse(s"unsupported ON condition: ${other.sql}")
    }

    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE is not supported")

    def assignmentsOf(actions: Seq[MergeAction], label: String)
        : Option[Map[String, Expression]] = actions match {
      case Nil => None
      case Seq(a) =>
        val (cond, assigns) = a match {
          case u: UpdateAction => (u.condition, u.assignments)
          case i: InsertAction => (i.condition, i.assignments)
          case other => refuse(s"unsupported $label action: $other")
        }
        if (cond.isDefined)
          refuse(s"conditional $label clauses are not supported")
        Some(assigns.map { as =>
          val name = as.key match {
            case ar: AttributeReference => ar.name
            case other => refuse(s"unsupported $label assignment target: $other")
          }
          if (!as.value.references.subsetOf(sourceRefs))
            refuse(s"$label value for '$name' references target columns")
          name -> as.value
        }.toMap)
      case _ => refuse(s"multiple $label clauses are not supported")
    }

    val updateAssigns = assignmentsOf(m.matchedActions, "WHEN MATCHED")
    val insertAssigns = assignmentsOf(m.notMatchedActions, "WHEN NOT MATCHED")
    if (updateAssigns.isEmpty && insertAssigns.isEmpty)
      refuse("no UPDATE or INSERT clause")

    WarehouseMergeCommand(table.dir, table.mergeKey,
      targetAttrs.map(a => a.name -> a.dataType.catalogString),
      m.sourceTable, srcKeyExpr, updateAssigns, insertAssigns)
  }
}

/** The rewritten MERGE: executes eagerly as a command (the
  * analyzer-produced node [[RewriteWarehouseMerge]] emits). Holds the
  * resolved source plan and assignment expressions; both resolve against
  * the source DataFrame rebuilt at run time (same plan, same exprIds). */
final case class WarehouseMergeCommand(
    dir: String, mergeKey: String,
    targetCols: Seq[(String, String)],
    source: LogicalPlan,
    srcKeyExpr: Expression,
    updateAssigns: Option[Map[String, Expression]],
    insertAssigns: Option[Map[String, Expression]])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftBridge.ofRows(spark, source)
    val epochSeqs = AtomicWarehouse.committedEpochs(spark, dir)
      .flatMap("""epoch_(\d+)""".r.findFirstMatchIn(_).map(_.group(1).toLong))
    require(epochSeqs.nonEmpty,
      s"MERGE INTO an empty warehouse at $dir — drain an epoch first " +
        "(the target schema and merge convention come from committed data)")
    val newSeq = epochSeqs.max + 1
    val dataCols = targetCols.map(_._1).filter(_ != "load_seq")

    def colExpr(assigns: Option[Map[String, Expression]], name: String) =
      assigns.flatMap(_.get(name)).map(GraftBridge.column)

    // FAST PATH: both branches exist, assign every data column, and
    // agree per column — the appended epoch is a pure source projection
    val symmetric = updateAssigns.isDefined && insertAssigns.isDefined &&
      dataCols.forall { c =>
        (updateAssigns.get.get(c), insertAssigns.get.get(c)) match {
          case (Some(u), Some(i)) => u.semanticEquals(i)
          case _ => false
        }
      }
    val newRows =
      if (symmetric)
        src.select(dataCols.map(c => colExpr(updateAssigns, c).get.as(c)) :+
          lit(newSeq).as("load_seq"): _*)
      else {
        // GENERAL PATH: old values / branch selection need the matched
        // target row — one left-outer join against the merged snapshot
        val merged = AtomicWarehouse.read(spark, dir, mergeKey)
        val t = merged.select(merged.columns.toSeq
          .map(c => col(c).as(s"__t_$c")): _*)
        val srcKey = GraftBridge.column(srcKeyExpr)
        val joined = src.join(t, srcKey === col(s"__t_$mergeKey"),
          "left_outer")
        val isMatched = col(s"__t_$mergeKey").isNotNull
        val actionable = (if (updateAssigns.isDefined) isMatched
          else lit(false)) ||
          (if (insertAssigns.isDefined) !isMatched else lit(false))
        val outCols = dataCols.map { c =>
          val u = colExpr(updateAssigns, c).getOrElse(col(s"__t_$c"))
          val i = colExpr(insertAssigns, c)
            .getOrElse(lit(null).cast(
              targetCols.find(_._1 == c).get._2))
          when(isMatched, u).otherwise(i).as(c)
        } :+ lit(newSeq).as("load_seq")
        joined.where(actionable).select(outCols: _*)
      }
    AtomicWarehouse.commitEpoch(spark, dir, newRows, newSeq,
      statsKey = Some(mergeKey), bloomKey = Some(mergeKey))
    Nil
  }
}
