package graft

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Editable scratch driver — point it at whatever module is under
  * iteration; not part of the library surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, shufflePartitions = 32)
    val li = Tables.load(spark, dir, "lineitem")
    def q186() = {
      val ref = li.filter(col("l_orderkey") % 2 === 0)
        .select(col("l_extendedprice").as("v"))
      val cur = li.filter(col("l_orderkey") % 2 === 1)
        .select((col("l_extendedprice") * 1.08).as("v"))
      graft.ops.Stats.psi(ref, cur, "v", bins = 10).orderBy("bucket")
    }
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      q186().collect()
      println(f"pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // components
    val ref = li.filter(col("l_orderkey") % 2 === 0)
      .select(col("l_extendedprice").as("v"))
    val cur = li.filter(col("l_orderkey") % 2 === 1)
      .select((col("l_extendedprice") * 1.08).as("v"))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val qps = (1 until 10).map(i => i / 10.0)
    for (i <- 1 to 4)
      time(s"fused profile $i")(
        ref.agg(graft.functions.ExactQuantiles
          .quantileBucketCounts(col("v"), qps)).collect())
    for (i <- 1 to 3)
      time(s"exactQuantiles $i")(
        ref.agg(graft.functions.ExactQuantiles
          .exactQuantiles(col("v"), qps)).collect())
    // codegen'd literal-edge bucketing vs the HOF array filter
    val litEdges = (1 to 9).map(i => 1000.0 * i)
    val bucketExpr = litEdges.foldLeft(lit(0L)) { (acc, e) =>
      acc + when(col("v") > lit(e), 1L).otherwise(0L) }
    time("bucket via literal sums")(
      ref.groupBy(bucketExpr.as("b")).agg(count(lit(1))).collect())
    time("bucket via literal sums again")(
      ref.groupBy(bucketExpr.as("b")).agg(count(lit(1))).collect())
    val ps = (1 until 10).map(i => i / 10.0)
    time("exact percentile")(
      ref.agg(expr(s"percentile(v, array(${ps.mkString(", ")}))")).collect())
    time("exact percentile again")(
      ref.agg(expr(s"percentile(v, array(${ps.mkString(", ")}))")).collect())
    val edges = ref.agg(expr(s"percentile(v, array(${ps.mkString(", ")}))").as("_e"))
      .select(transform(col("_e"), e => round(e, 4)).as("_e"))
    time("bucket one side")(
      ref.crossJoin(broadcast(edges))
        .withColumn("bucket", size(filter(col("_e"), e => col("v") > e)))
        .groupBy("bucket").agg(count(lit(1))).collect())
    val out = q186()
    out.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flat(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(flat)
    }
    val nodes = flat(out.queryExecution.executedPlan)
    val scans = nodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.FileSourceScanExec])
    val reused = nodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ReusedExchangeExec])
    println(s"ScanNodes=$scans ReusedExchange=$reused total=${nodes.length}")
    spark.stop()
  }
}
