package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan, OneRowRelation, Project, Window => LWindow}
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
  *    product;
  *  - ORDERED Window (any function with an ORDER BY — ranks,
  *    running sums, lags alike: each implies a per-partition sort)
  *    over an UNAGGREGATED input whose partition keys all derive
  *    from known bounded-cardinality columns: the
  *    whole input funnels into ≤|distinct keys| reducers — correct
  *    and sub-second on a laptop, a handful of straggler tasks
  *    sorting everything at 100 TB (the round-9 audit's one weak
  *    class). Cardinality is a DATA property the optimizer can't
  *    see, so the deployment names its bounded columns via the
  *    runtime conf `spark.graft.planGuard.lowCardCols`
  *    (comma-separated, case-insensitive, resolved through aliases
  *    to the source columns; empty default keeps the check inert).
  *    A window whose input is already aggregated (grouped on the
  *    same bounded key plus a value) is exempt — its frame is the
  *    bounded histogram, the exact shape the radix-median plans use.
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
  val LowCardColsKey = "spark.graft.planGuard.lowCardCols"

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
  private def bounded(p: LogicalPlan): Boolean = bounded(p, useStats = true)

  /** `useStats = false` is the STRUCTURAL variant the low-card
    * ranked-window check uses: a leaf's size at hand says nothing
    * about its production size (the lint exists precisely for plans
    * that are tiny under test and 100 TB in production), so only
    * shape-guaranteed bounds — limits, one-row aggregates, local
    * relations — count there. */
  private def bounded(p: LogicalPlan, useStats: Boolean): Boolean = p match {
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
          bounded(j.left, useStats)
        case _ => bounded(j.left, useStats) && bounded(j.right, useStats)
      }
    case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
      u.children.forall(bounded(_, useStats))
    case n if n.children.size == 1 => bounded(n.children.head, useStats)
    case leaf => useStats && leaf.stats.sizeInBytes <= BoundedBytes
  }

  def violations(plan: LogicalPlan): Seq[Violation] =
    violations(plan, Set.empty)

  def violations(plan: LogicalPlan,
      lowCardCols: Set[String]): Seq[Violation] =
    plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) =>
        Violation("partition-less-window", w.simpleString(80))
      case w: LWindow if lowCardCols.nonEmpty &&
        w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
        !aggregatedBelow(w.child) && !groupLimited(w.child) &&
        !bounded(w.child, useStats = false) &&
        w.partitionSpec.forall { pe =>
          val rs = rootNames(pe, w.child)
          rs.nonEmpty && rs.forall(n => lowCardCols(n.toLowerCase))
        } =>
        Violation("low-card-ordered-window", w.simpleString(80))
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

  /** A grouped Aggregate anywhere below means the window's input is
    * a rollup (a histogram / counts frame), not raw rows — the
    * bounded-frame shape the radix/histogram order-statistic plans
    * deliberately rank over. */
  private def aggregatedBelow(p: LogicalPlan): Boolean =
    p.exists {
      case a: Aggregate => a.groupingExpressions.nonEmpty
      case _ => false
    }

  /** A WindowGroupLimit below (Catalyst's rank-limit pushdown for
    * `rank <= LITERAL` filters) caps every map task's forwarding at
    * k rows per key BEFORE the exchange — the reducer receives at
    * most k·maps rows however large the input, so the low-card
    * funnel never carries the corpus. */
  private def groupLimited(p: LogicalPlan): Boolean =
    p.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
        true
      case _ => false
    }

  /** Root source-column names feeding `e`, resolved transitively
    * through every Alias produced below (Project / Aggregate /
    * Window output lists) down to leaf attributes — so partitioning
    * on `col("l_returnflag").as("g")` is judged by `l_returnflag`,
    * not by the alias `g`. */
  private def rootNames(e: Expression, below: LogicalPlan): Set[String] = {
    val aliasMap = scala.collection.mutable.Map.empty[ExprId, Expression]
    below.foreach { n =>
      val outs = n match {
        case p: Project => p.projectList
        case a: Aggregate => a.aggregateExpressions
        case w: LWindow => w.windowExpressions
        case _ => Nil
      }
      outs.foreach {
        case al: Alias => aliasMap.update(al.exprId, al.child)
        case _ => ()
      }
    }
    def roots(ex: Expression, depth: Int): Set[String] =
      if (depth > 40) Set.empty
      else ex.references.toSeq.flatMap { att =>
        aliasMap.get(att.exprId) match {
          case Some(under) => roots(under, depth + 1).toSeq
          case None => Seq(att.name)
        }
      }.toSet
    roots(e, 0)
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
      val lowCard = session.conf.get(PlanGuard.LowCardColsKey, "")
        .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
      val vs = PlanGuard.violations(plan, lowCard)
      if (vs.nonEmpty) {
        val msg = s"plan guard: ${vs.mkString("; ")}"
        if (mode == "strict") throw new PlanGuard.PlanGuardViolation(msg)
        else logWarning(msg)
      }
    }
    plan
  }
}
