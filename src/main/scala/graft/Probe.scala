package graft

import org.apache.spark.sql.functions._

/** Editable scratch driver (see .claude/skills/verify). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dir = "/root/testdata/sf0.001"
    val out = Queries.tmpDir("graft_probe_skip")
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_shipdate")
    graft.ops.Layout.rangeSortedWrite(li, col("l_orderkey"), s"$out/data",
      numFiles = 8, tiebreak = Seq(col("l_orderkey")),
      statsManifest = Some(s"$out/mf"), statsCols = Seq("l_orderkey"))
    val pruned = graft.core.io.Skipping.read(spark, s"$out/data", s"$out/mf",
      Seq(graft.core.io.Skipping.ColumnRange("l_orderkey",
        Some(100L), Some(299L))))
    pruned.explain("formatted")
    println(s"rows=${pruned.count()} files=${pruned.inputFiles.length}")
    spark.stop()
  }
}
