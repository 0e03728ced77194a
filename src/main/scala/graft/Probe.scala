package graft

import org.apache.spark.sql.functions._

/** Editable scratch driver (see .claude/skills/verify). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val out = Queries.tmpDir("graft_probe_fc")
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_shipdate").localCheckpoint()
    val hi = li.agg(max("l_orderkey")).head().getLong(0)
    graft.ops.Layout.rangeSortedWrite(li, col("l_orderkey"), s"$out/data",
      numFiles = 1024)
    def t(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  $r")
    }
    t("footer build (1024)")(
      graft.core.io.Skipping.writeStatsManifestFromFooters(spark,
        s"$out/data", Seq("l_orderkey", "l_shipdate"), s"$out/mf"))
    val range = Seq(graft.core.io.Skipping.ColumnRange("l_orderkey",
      Some(hi / 20), Some(hi / 10)))
    t("pruned read (1024)")(graft.core.io.Skipping.read(spark, s"$out/data",
      s"$out/mf", range).agg(count(lit(1))).head().getLong(0))
    t("plain filter scan (1024)")(spark.read.parquet(s"$out/data")
      .filter(col("l_orderkey").between(hi/20, hi/10))
      .agg(count(lit(1))).head().getLong(0))
    spark.stop()
  }
}
