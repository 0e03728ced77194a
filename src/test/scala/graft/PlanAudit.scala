package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The anti-pattern sweep shared by [[PlanAuditSpec]] (the batch gate
  * roster) and the side-effect suites (skipping/streaming frames that
  * execute at build time and so are audited where they run): flags
  * CartesianProduct, BroadcastNestedLoopJoin without a provably tiny
  * build side, and duplicate UNREUSED shuffle exchanges in the
  * POST-execution adaptive plan.
  */
object PlanAudit {

  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Anti-pattern findings for an EXECUTED DataFrame's final plan.
    * `allowGatedBnlj` skips the BNLJ check for frames whose broadcast is
    * runtime-gated (the brute-force-cosine design).
    */
  def violations(name: String, df: DataFrame,
                 allowGatedBnlj: Boolean = false): Seq[String] = {
    val nodes = flatten(df.queryExecution.executedPlan)
    val cart = nodes.collect { case _: CartesianProductExec =>
      s"$name: CartesianProduct" }
    def tinyBuild(j: BroadcastNestedLoopJoinExec): Boolean = {
      val build = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      // resolve exchange reuse LOCALLY (a build side that reuses a
      // single-row aggregate's broadcast — q186's shared quantile edges —
      // is as tiny as the original); the global flatten must NOT look
      // through ReusedExchangeExec or every runtime reuse would read as
      // a duplicate exchange
      flatten(build).flatMap {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          flatten(r.child)
        case p => Seq(p)
      }.exists {
        case a: BaseAggregateExec => a.groupingExpressions.isEmpty
        case l: LocalTableScanExec => l.rows.lengthCompare(1) <= 0
        case _ => false
      }
    }
    val bnlj =
      if (allowGatedBnlj) Nil
      else nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
        .filterNot(tinyBuild)
        .map(_ => s"$name: ungated BroadcastNestedLoopJoin")
    val dup = nodes.collect { case e: ShuffleExchangeExec => e }
      .groupBy(_.canonicalized)
      .collect { case (_, es) if es.lengthCompare(1) > 0 =>
        s"$name: ${es.length} unreused duplicate exchanges over one subtree" }
    cart ++ bnlj ++ dup.toSeq
  }

  /** Execute `df` (collect drives ITS OWN QueryExecution, so AQE mutates
    * to the final reuse-resolved plan) and fail on any anti-pattern.
    */
  def assertClean(name: String, df: DataFrame): Unit = {
    df.collect()
    val found = violations(name, df)
    require(found.isEmpty, s"plan anti-patterns:\n${found.mkString("\n")}")
  }
}
