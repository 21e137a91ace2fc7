package graft.plans

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, CaseWhen, Coalesce, Expression, Literal, StringTranslate}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import graft.functions.TitleMainCode
import graft.ops.TitleCode

/** Catalyst rewrite rule (SURVEY.md §7.3a): collapse the composed
  * title-code Column chain — F1 extract-last-word + F3/F4/F5 purge gates,
  * a translate/split/element_at/regexp CaseWhen tree that scans the
  * string ~4× and allocates a token array — into the fused single-pass
  * codegen expression `TitleMainCode`.
  *
  * Matching is semantic, not syntactic: a candidate CaseWhen is compared
  * by canonicalized equality against the reference chain (analyzed once
  * over a placeholder attribute, then re-targeted at the candidate's
  * source), so ONLY exact semantic matches fuse — any user variation
  * (different separator, extra branch) is left untouched.
  *
  * The rewrite wraps the source in coalesce(src, '') — same as the chain
  * does — so null titles keep producing "" (the fused expression alone is
  * null-propagating).
  *
  * Runs as a post-hoc RESOLUTION rule (GraftExtensions injects it via
  * injectPostHocResolutionRule): it must see the freshly-analyzed tree —
  * by optimizer time, ConstantFolding / PushFoldableIntoBranches have
  * already restructured the chain beyond template equality.
  */
object FuseTitleCode extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (building.get) plan
    else plan.transformAllExpressions {
      case e: CaseWhen =>
        titleSource(e) match {
          case Some(src)
              if e.canonicalized == templateFor(src).canonicalized =>
            TitleMainCode(Coalesce(Seq(src, Literal(""))))
          case _ => e
        }
    }

  /** Placeholder the template is analyzed against. */
  private val placeholder = AttributeReference("__title", StringType)()

  /** Guards against re-entrant analysis: building the template runs the
    * analyzer, whose post-hoc batch includes THIS rule. */
  private val building = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  /** The reference chain, resolved ONCE through a real Dataset analysis —
    * the Column API builds lazy column-node wrappers that only the full
    * Dataset analysis path converts to comparable Catalyst expressions. */
  private lazy val template: Expression = {
    building.set(true)
    try {
      val spark = SparkSession.active
      val df = GraftBridge.ofRows(spark, LocalRelation(placeholder))
      df.select(TitleCode.mainCode(GraftBridge.column(placeholder)).as("__t"))
        .queryExecution.analyzed
        .asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
    } finally building.set(false)
  }

  /** Template re-targeted at a concrete source expression. */
  private def templateFor(src: Expression): Expression =
    template.transform { case a: AttributeReference if a.exprId == placeholder.exprId => src }

  /** Candidate title column: the x in translate(coalesce(x, ''), '|', ' ')
    * anywhere under the expression — the unmistakable F1 fingerprint. */
  private def titleSource(e: Expression): Option[Expression] =
    e.collectFirst {
      case StringTranslate(Coalesce(Seq(src, Literal(empty, StringType))),
          Literal(pipe, StringType), Literal(space, StringType))
          if String.valueOf(empty) == "" && String.valueOf(pipe) == "|" &&
            String.valueOf(space) == " " => src
    }
}
