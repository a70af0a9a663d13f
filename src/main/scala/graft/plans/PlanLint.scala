package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule

/** Static scale-hazard lint over logical plans.
  *
  * Two hazards that are invisible at test scale and fatal at 100 TB:
  *
  *  - '''cartesian/unconditioned joins''' — an inner join with no
  *    condition (or an explicit CROSS) multiplies its inputs; at
  *    cluster scale that is almost always a missing join key.
  *  - '''unpartitioned windows''' — a window function whose spec has no
  *    PARTITION BY funnels the ENTIRE input through one partition
  *    (Spark itself warns at execution time; this surfaces it at plan
  *    time, before the job runs for hours first).
  *
  * `lint(df)` is the pure API: findings for one plan. [[PlanLintRule]]
  * is the same check injected into the optimizer via
  * `SparkSessionExtensions.injectOptimizerRule` (see GraftExtensions),
  * where it logs each distinct finding ONCE per JVM — the rule never
  * rewrites anything, so it cannot change results.
  */
object PlanLint {

  final case class Finding(kind: String, node: String) {
    override def toString: String = s"[$kind] $node"
  }

  def lintPlan(plan: LogicalPlan): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    plan.foreach {
      case j: Join if j.condition.isEmpty && (j.joinType == Inner || j.joinType == Cross) =>
        out += Finding("cartesian-join", j.simpleString(60))
      case w: Window if w.partitionSpec.isEmpty && w.windowExpressions.nonEmpty =>
        out += Finding("unpartitioned-window", w.simpleString(60))
      case _ =>
    }
    out.result()
  }

  /** Lint a DataFrame's analyzed plan (pre-optimization: what the user
    * wrote, before Catalyst might e.g. convert a filtered cross join
    * into a conditioned one).
    */
  def lint(df: DataFrame): Seq[Finding] = lintPlan(df.queryExecution.analyzed)
}

/** Optimizer-injected variant: logs each distinct hazard once per JVM.
  * Runs inside a fixed-point batch, hence the dedup — and it returns
  * the plan UNCHANGED (lint, not rewrite).
  */
case class PlanLintRule() extends Rule[LogicalPlan] with Logging {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    PlanLint.lintPlan(plan).foreach { f =>
      // normalize away per-plan expression ids (#123) so the SAME
      // logical hazard from many queries dedups to one key — and bound
      // the map so a pathological stream of distinct hazards can't grow
      // it for the JVM's lifetime
      val key = f.kind + "|" + f.node.replaceAll("#\\d+", "#")
      if (PlanLintRule.seen.size() < PlanLintRule.MaxTracked &&
          PlanLintRule.seen.putIfAbsent(key, java.lang.Boolean.TRUE) == null) {
        logWarning(s"graft plan lint: ${f.kind} — ${f.node} " +
          "(single-partition / multiplicative work at scale)")
      }
    }
    plan
  }
}

object PlanLintRule {
  private val MaxTracked = 1000
  private val seen = new ConcurrentHashMap[String, java.lang.Boolean]()
  /** Test hook. */
  private[graft] def reset(): Unit = seen.clear()
  private[graft] def seenKinds: Set[String] =
    { import scala.jdk.CollectionConverters._
      seen.keySet().asScala.toSet }
}
