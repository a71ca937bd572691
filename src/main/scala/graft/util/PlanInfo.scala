package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.SparkPlan

/** Execution-plan introspection for structural tests (reference
  * StreamNodeInfo, model/StreamNodeInfo.scala:7-44 + FlinkRunner.scala:109-123:
  * tests assert the job graph's sources/operators without executing it).
  * Spark's analog walks the physical plan.
  */
object PlanInfo {

  final case class Summary(
      scans: Seq[String], // data-source descriptions (file paths / formats)
      joins: Seq[String], // join node names (BroadcastHashJoin, SortMergeJoin...)
      aggregates: Int, // HashAggregate/ObjectHashAggregate/SortAggregate count
      exchanges: Int, // shuffle boundaries
      hasCartesian: Boolean)

  def of(ds: Dataset[_]): Summary = {
    val nodes = collect(ds.queryExecution.executedPlan)
    val names = nodes.map(_.nodeName)
    Summary(
      scans = nodes.filter(_.nodeName.contains("Scan")).map(_.simpleStringWithNodeId()),
      joins = names.filter(_.contains("Join")),
      aggregates = names.count(_.contains("Aggregate")),
      exchanges = names.count(_.contains("Exchange")),
      hasCartesian = names.exists(n =>
        n.contains("CartesianProduct") || n.contains("BroadcastNestedLoopJoin")))
  }

  private def collect(plan: SparkPlan): Seq[SparkPlan] = {
    val descend = plan match {
      // AQE wraps the whole query; its logical children are hidden behind
      // the adaptive node, so walk the current physical plan inside it
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.inputPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case other => other.children
    }
    plan +: (descend ++ plan.subqueries).flatMap(collect)
  }
}
