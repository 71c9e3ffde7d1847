package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan, OneRowRelation, Window => LWindow}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan linting as an optimizer rule — the scale discipline this
  * repo's PlanAuditSpec enforces over its own registry, packaged so
  * ANY session can enforce it on ANY query: the three logical-plan
  * shapes that work on a laptop and melt at 100 TB are detected at
  * optimization time and, under `spark.graft.planGuard=strict`,
  * rejected before a single task launches.
  *
  *  - partition-less Window: the whole input sorts in ONE task's
  *    window partition;
  *  - grouping-less collect_list/collect_set: the whole input lands
  *    in one aggregation buffer;
  *  - condition-less Join with both sides unbounded: a cartesian
  *    product.
  *
  * "Bounded" is judged structurally, the same way the audit does: a
  * GlobalLimit (orderBy().limit(k) / TakeOrdered), a LocalRelation, a
  * OneRowRelation, or a grouping-less Aggregate (a one-row scalar —
  * the engine's broadcast-scalar cross joins stay legal) anywhere
  * below the operator. Modes via the RUNTIME conf
  * `spark.graft.planGuard`: `off` (default — zero overhead beyond one
  * conf read), `warn` (log and proceed), `strict` (throw
  * [[PlanGuard.PlanGuardViolation]]). Registered by
  * [[graft.GraftExtensions]] through the public
  * `injectOptimizerRule` seam. */
object PlanGuard {

  val ConfKey = "spark.graft.planGuard"

  final class PlanGuardViolation(msg: String)
    extends RuntimeException(msg)

  final case class Violation(kind: String, operator: String) {
    override def toString: String = s"[$kind] $operator"
  }

  /** Rows below which a leaf/Range counts as bounded, and the stats
    * size below which any relation does (the broadcast-threshold
    * intuition: if it would broadcast, it won't melt a single task). */
  private val BoundedRows = 100000L
  private val BoundedBytes = BigInt(10L * 1024 * 1024)

  /** Recursive boundedness: `p` is bounded when its OWN row count is
    * structurally capped — not when some branch merely contains a
    * bounded node (the first cut used collectFirst and blessed
    * corpus ⋈ scalar joins through the scalar branch, exactly the
    * shape the guard exists to reject). A Join is bounded only when
    * BOTH inputs are; unary operators inherit their child; leaves
    * fall back to optimizer statistics (a persisted one-row scalar's
    * InMemoryRelation and a small Range both pass, a corpus relation
    * does not). */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: LocalRelation | _: OneRowRelation => true
    case _: GlobalLimit => true
    case r: org.apache.spark.sql.catalyst.plans.logical.Range =>
      r.numElements <= BoundedRows
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case j: Join =>
      j.joinType match {
        // semi/anti output is a subset of the left input
        case org.apache.spark.sql.catalyst.plans.LeftSemi |
             org.apache.spark.sql.catalyst.plans.LeftAnti =>
          bounded(j.left)
        case _ => bounded(j.left) && bounded(j.right)
      }
    case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
      u.children.forall(bounded)
    case n if n.children.size == 1 => bounded(n.children.head)
    case leaf => leaf.stats.sizeInBytes <= BoundedBytes
  }

  def violations(plan: LogicalPlan): Seq[Violation] =
    plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) =>
        Violation("partition-less-window", w.simpleString(80))
      case a: Aggregate if a.groupingExpressions.isEmpty &&
        a.aggregateExpressions.exists(_.exists {
          case _: CollectList | _: CollectSet => true
          case _ => false
        }) && !bounded(a.child) =>
        Violation("unbounded-collect", a.simpleString(80))
      case j: Join if j.condition.isEmpty &&
        !bounded(j.left) && !bounded(j.right) =>
        Violation("unbounded-cross-join", j.simpleString(80))
    }
}

/** The injectable rule: reads the mode per invocation (runtime conf,
  * so callers can flip it mid-session), scans, and warns or throws.
  * Always returns the plan unchanged — a pure lint, never a rewrite,
  * so it cannot perturb optimization. */
class PlanGuardRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = session.conf.get(PlanGuard.ConfKey, "off")
    if (mode != "off") {
      val vs = PlanGuard.violations(plan)
      if (vs.nonEmpty) {
        val msg = s"plan guard: ${vs.mkString("; ")}"
        if (mode == "strict") throw new PlanGuard.PlanGuardViolation(msg)
        else logWarning(msg)
      }
    }
    plan
  }
}
