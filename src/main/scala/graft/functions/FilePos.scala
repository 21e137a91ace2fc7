package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Constant-time file-name → manifest-position lookup — the expression
  * that lets [[graft.sinks.AtomicWarehouse]]'s merged read serve ALL
  * epochs of one schema from a SINGLE native parquet relation while
  * keeping the per-row `__pos` (manifest position, the last-wins
  * tiebreaker) the per-epoch union used to provide as a per-relation
  * literal.
  *
  * Applied to `_metadata.file_name` (constant per file, so the branch
  * predictor and the hash probe are effectively free), it maps the part
  * file's name to the manifest index of the epoch that owns it. A plain
  * `element_at(map_literal, ...)` would be O(|files|) PER ROW —
  * Catalyst's `GetMapValue` linear-scans literal maps — which at 32k
  * files is exactly the kind of hidden quadratic this engine exists to
  * avoid; this is one hash probe, inlined by whole-stage codegen.
  *
  * A file name absent from the map is an INVARIANT BREACH (epoch dirs
  * are publish-once immutable and the map is built from the same
  * manifest file lists the scan plans from), so it throws rather than
  * returning null — a null would silently misorder the merge window.
  */
case class FilePos(child: Expression, posByFile: Map[String, Int])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_file_pos"

  // Catalyst hashes expression trees freely (rule sets, semantic-equals
  // canonicalization); the default case-class hash walks the whole map
  // — O(files) PER CALL at tens of thousands of entries. Compute once.
  @transient private lazy val cachedHash: Int =
    scala.util.hashing.MurmurHash3.productHash(this)
  override def hashCode(): Int = cachedHash

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.sql}")

  // rebuilt once per deserialized task; UTF8String keys so the probe
  // never materializes a java.lang.String per row
  @transient private lazy val jmap: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](posByFile.size * 2)
    posByFile.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), Integer.valueOf(v))
    }
    m
  }

  /** The executor-side probe, shared by eval and codegen. */
  def lookup(name: UTF8String): Int = {
    val hit = jmap.get(name)
    if (hit == null)
      throw new IllegalStateException(
        s"data file '$name' is not in the manifest file map — epoch dirs " +
          "are publish-once immutable, so a scan can only see files the " +
          "manifest (or its commit-time listing) recorded")
    hit.intValue()
  }

  override def nullSafeEval(name: Any): Any =
    lookup(name.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("filePos", this, classOf[FilePos].getName)
    nullSafeCodeGen(ctx, ev, name => s"${ev.value} = $self.lookup($name);")
  }

  override protected def withNewChildInternal(newChild: Expression): FilePos =
    copy(child = newChild)
}

object FilePos {
  /** Column form over `_metadata.file_name`. */
  def apply(c: Column, posByFile: Map[String, Int]): Column =
    GraftBridge.column(FilePos(GraftBridge.expression(c), posByFile))
}
