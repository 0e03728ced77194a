package graft
import graft.core.GraftSession
object ProbeAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 8, shufflePartitions = 8)
    val dir = "/root/testdata/sf0.001"
    Queries.all.sortBy(_.name).foreach { q =>
      try {
        val df = q.run(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoopJoin"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "noPushedFilters" -> (plan.contains("PushedFilters: []") &&
            plan.contains("DataFilters: [") && !plan.contains("PushedFilters: [Is")),
        ).collect { case (n, true) => n }
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        println(f"${q.name}%-28s exchanges=$exchanges%-3d ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"${q.name} ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
