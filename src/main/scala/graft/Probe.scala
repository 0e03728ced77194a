package graft

import org.apache.spark.sql.functions._

/** Editable scratch driver (see the project verify notes). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$n%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s  $r")
    }
    val msRoot = java.nio.file.Files
      .createTempDirectory("graft_mfshard").toString
    for (nf <- Seq(1000, 10000)) {
      val data = s"$msRoot/d$nf"
      spark.range(nf.toLong).repartition(nf).select(col("id").as("k"))
        .write.parquet(data)
      val mf = s"$msRoot/m$nf"
      time(s"sharded manifest build ($nf files)") {
        graft.core.io.Skipping.writeStatsManifestFromFooters(spark, data,
          Seq("k"), mf)
      }
      spark.range(1).select(lit(-1L).as("k")).coalesce(1)
        .write.mode("append").parquet(data)
      time(s"steady-state tick, 1 new file ($nf files)") {
        graft.core.io.Skipping.appendStatsManifest(spark, data, mf)
          .profiledFiles.toLong
      }
      time(s"no-op tick ($nf files)") {
        graft.core.io.Skipping.appendStatsManifest(spark, data, mf)
          .profiledFiles.toLong
      }
    }
    spark.stop()
  }
}
