package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo}
import org.apache.spark.sql.types.{LongType, StringType}
import graft.functions.{BloomMightContain, HexPrefixLong, HexTopBitsPack, SecondsToHms, TitleMainCode, VecDot}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions callable from SQL.
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   SELECT seconds_to_hms(avg_view_duration_s), title_main_code(title) …
  *
  * For an already-running session use GraftExtensions.register(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // post-hoc RESOLUTION rule, not an optimizer rule: the fuse matches
    // the freshly-analyzed chain; by optimizer time ConstantFolding /
    // PushFoldableIntoBranches have already rewritten it beyond template
    // equality
    ext.injectPostHocResolutionRule(_ => graft.plans.FuseTitleCode)
    // MERGE INTO on graft-warehouse catalog tables → one appended upsert
    // epoch (the K4 scatter-update as SQL); must run at analysis, before
    // Spark's own row-level-operation rewrite refuses the table
    ext.injectPostHocResolutionRule(_ => graft.plans.RewriteWarehouseMerge)
    // physical planning for the native top-k-per-group logical node
    // (graft.plans.TopKPerGroup → partial/final bounded-heap pair)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects exactly 1 argument")
    args.head
  }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("seconds_to_hms",
      new ExpressionInfo(classOf[SecondsToHms].getName, "seconds_to_hms"),
      args => SecondsToHms(Cast(one(args, "seconds_to_hms"), LongType))),
    ("title_main_code",
      new ExpressionInfo(classOf[TitleMainCode].getName, "title_main_code"),
      args => TitleMainCode(Cast(one(args, "title_main_code"), StringType))),
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      args => {
        require(args.length == 2, "vec_dot expects exactly 2 arguments")
        VecDot(args(0), args(1))
      }),
    ("hex_topbits_pack",
      new ExpressionInfo(classOf[HexTopBitsPack].getName, "hex_topbits_pack"),
      args => HexTopBitsPack(Cast(one(args, "hex_topbits_pack"), StringType))),
    ("hex_prefix_long",
      new ExpressionInfo(classOf[HexPrefixLong].getName, "hex_prefix_long"),
      args => {
        require(args.length == 2, "hex_prefix_long expects exactly 2 arguments")
        val n = args(1) match {
          case e if e.foldable =>
            val v = Cast(e, org.apache.spark.sql.types.IntegerType).eval()
            if (v == null) throw new IllegalArgumentException(
              "hex_prefix_long digit count must be a non-null integer literal")
            v.asInstanceOf[Int]
          case _ => throw new IllegalArgumentException(
            "hex_prefix_long digit count must be a literal")
        }
        HexPrefixLong(Cast(args(0), StringType), n)
      }),
    ("bloom_might_contain",
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      args => {
        require(args.length == 2, "bloom_might_contain expects exactly 2 arguments")
        BloomMightContain(Cast(args(0), LongType), args(1))
      }))

  /** Register on a live session (temp functions only — analyzer rules
    * like FuseTitleCode are fixed at session creation; start the session
    * with spark.sql.extensions=graft.GraftExtensions to get the fuse). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
