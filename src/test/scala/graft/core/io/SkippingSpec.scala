package graft.core.io

import graft.SparkSpec
import graft.core.io.Skipping.ColumnRange
import graft.ops.Layout
import org.apache.spark.sql.functions._

class SkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_skip").toString
    (s"$root/data", s"$root/manifest")
  }

  private def corpus() = spark.range(0, 1000)
    .select(col("id"),
      (col("id") * 7 % 1000).as("v"),
      concat(lit("k"), lpad(col("id").cast("string"), 4, "0")).as("s"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") / 10).cast("int")).as("d"))

  test("pruned read equals full filter and reads fewer files") {
    val (data, mf) = freshDirs()
    Layout.rangeSortedWrite(corpus(), col("id"), data, numFiles = 10,
      tiebreak = Seq(col("id")))
    assert(Skipping.writeStatsManifest(spark, data,
      Seq("id", "s", "d"), mf) === 10L)

    val ranges = Seq(ColumnRange("id", Some(100L), Some(299L)))
    val pruned = Skipping.pruneFiles(spark, data, mf, ranges)
    assert(pruned.unlistedFiles === 0)
    assert(pruned.manifestFiles === 10)
    assert(pruned.readFiles <= 3, s"range-clustered layout must prune " +
      s"to ~2 of 10 files, read ${pruned.readFiles}")

    val got = Skipping.read(spark, data, mf, ranges)
    val want = spark.read.parquet(data)
      .filter(col("id") >= 100 && col("id") <= 299)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() === 200)
    // the scan itself only touches the surviving files
    assert(got.inputFiles.length === pruned.readFiles)
  }

  test("string and date ranges prune lexicographically/chronologically") {
    val (data, mf) = freshDirs()
    Layout.rangeSortedWrite(corpus(), col("id"), data, numFiles = 10,
      tiebreak = Seq(col("id")))
    Skipping.writeStatsManifest(spark, data, Seq("id", "s", "d"), mf)
    // s = k0000..k0999 clustered with id; d advances every 10 ids
    val sGot = Skipping.read(spark, data, mf,
      Seq(ColumnRange("s", Some("k0500"), Some("k0549"))))
    assert(sGot.count() === 50)
    assert(sGot.inputFiles.length <= 2)
    val dGot = Skipping.read(spark, data, mf,
      Seq(ColumnRange("d", Some("2024-01-11"), Some("2024-01-20"))))
    assert(dGot.count() === 100) // ids 100..199
    assert(dGot.inputFiles.length <= 2)
    // conjunction: the tighter column wins
    val both = Skipping.read(spark, data, mf,
      Seq(ColumnRange("id", Some(0L), Some(999L)),
        ColumnRange("s", Some("k0990"), None)))
    assert(both.count() === 10)
    assert(both.inputFiles.length <= 2)
  }

  test("files appended after the manifest are read conservatively") {
    val (data, mf) = freshDirs()
    Layout.rangeSortedWrite(corpus(), col("id"), data, numFiles = 5,
      tiebreak = Seq(col("id")))
    Skipping.writeStatsManifest(spark, data, Seq("id"), mf)
    // late arrival OUTSIDE every profiled range
    spark.range(5000, 5010).select(col("id"),
        lit(0L).as("v"), lit("zzz").as("s"),
        lit(java.sql.Date.valueOf("2030-01-01")).as("d"))
      .coalesce(1).write.mode("append").parquet(data)
    val ranges = Seq(ColumnRange("id", Some(5000L), None))
    val pruned = Skipping.pruneFiles(spark, data, mf, ranges)
    assert(pruned.unlistedFiles === 1)
    val got = Skipping.read(spark, data, mf, ranges)
    assert(got.count() === 10) // the unlisted file is always scanned
    // and the 5 stale-manifest files were still pruned away
    assert(got.inputFiles.length === 1)
  }

  test("all-null stats prune; wrong-typed bounds degrade to no pruning") {
    val (data, mf) = freshDirs()
    // one file of values, one file entirely null in v
    Seq((1L, Option(5L)), (2L, Option(6L))).toDF("id", "v")
      .coalesce(1).write.parquet(data)
    Seq((3L, Option.empty[Long]), (4L, Option.empty[Long])).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(data)
    Skipping.writeStatsManifest(spark, data, Seq("v"), mf)
    val p = Skipping.pruneFiles(spark, data, mf,
      Seq(ColumnRange("v", Some(0L), Some(100L))))
    assert(p.readFiles === 1, "the all-null file is prunable: range " +
      "predicates reject null")
    // a String bound probing a long-profiled column: the min/max
    // comparison degrades to no pruning (typed slots are null), but the
    // all-null exclusion still applies — row filters reject null for
    // any bound type
    val loose = Skipping.pruneFiles(spark, data, mf,
      Seq(ColumnRange("v", Some("5"), None)))
    assert(loose.readFiles === 1)
    val got = Skipping.read(spark, data, mf,
      Seq(ColumnRange("v", Some("5"), None)))
    assert(got.count() ===
      spark.read.parquet(data).filter(col("v") >= "5").count())
  }

  test("empty survivor set returns an empty, correctly-shaped frame") {
    val (data, mf) = freshDirs()
    Layout.rangeSortedWrite(corpus(), col("id"), data, numFiles = 4,
      tiebreak = Seq(col("id")))
    Skipping.writeStatsManifest(spark, data, Seq("id"), mf)
    val got = Skipping.read(spark, data, mf,
      Seq(ColumnRange("id", Some(10000L), None)))
    assert(got.isEmpty)
    assert(got.columns.toSeq === Seq("id", "v", "s", "d"))
  }

  test("appendStatsManifest profiles only new files, drops vanished ones") {
    val (data, mf) = freshDirs()
    Layout.rangeSortedWrite(corpus().filter(col("id") < 500), col("id"),
      data, numFiles = 5, tiebreak = Seq(col("id")))
    Skipping.writeStatsManifest(spark, data, Seq("id", "s"), mf)
    // append two new range-clustered files
    Layout.rangeSortedWrite(corpus().filter(col("id") >= 500), col("id"),
      s"${data}_late", numFiles = 2, tiebreak = Seq(col("id")))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val late = fs.listStatus(new org.apache.hadoop.fs.Path(s"${data}_late"))
      .filter(_.getPath.getName.endsWith(".parquet"))
    late.zipWithIndex.foreach { case (st, i) =>
      fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(s"$data/late-$i.parquet"))
    }
    val d1 = Skipping.appendStatsManifest(spark, data, mf)
    assert(d1.profiledFiles === 2 && d1.droppedFiles === 0 &&
      d1.totalFiles === 7)
    // the freshly profiled files now PRUNE (not just conservative-read):
    val p = Skipping.pruneFiles(spark, data, mf,
      Seq(ColumnRange("id", Some(900L), None)))
    assert(p.unlistedFiles === 0)
    assert(p.readFiles === 1, "only the upper late file overlaps")
    val got = Skipping.read(spark, data, mf,
      Seq(ColumnRange("id", Some(900L), None)))
    assert(got.count() === 100)
    // inherited column set: string ranges keep working on appended files
    assert(Skipping.read(spark, data, mf,
      Seq(ColumnRange("s", Some("k0990"), None))).count() === 10)
    // idempotent when nothing changed
    val d2 = Skipping.appendStatsManifest(spark, data, mf)
    assert(d2.profiledFiles === 0 && d2.droppedFiles === 0)
    // vanished files drop from the manifest on the next tick
    fs.delete(new org.apache.hadoop.fs.Path(s"$data/late-0.parquet"), false)
    val d3 = Skipping.appendStatsManifest(spark, data, mf)
    assert(d3.profiledFiles === 0 && d3.droppedFiles === 1 &&
      d3.totalFiles === 6)
    assert(Skipping.read(spark, data, mf,
      Seq(ColumnRange("id", Some(0L), None))).count() ===
      spark.read.parquet(data).count())
  }

  test("manifest survives compaction: rewritten files read as unlisted") {
    val (data, mf) = freshDirs()
    Layout.rangeSortedWrite(corpus(), col("id"), data, numFiles = 8,
      tiebreak = Seq(col("id")))
    Skipping.writeStatsManifest(spark, data, Seq("id"), mf)
    Maintenance.compactParquet(spark, data, targetFileBytes = 1L << 30)
    val ranges = Seq(ColumnRange("id", Some(0L), Some(49L)))
    val got = Skipping.read(spark, data, mf, ranges)
    assert(got.count() === 50, "post-compaction reads fall back to " +
      "conservative full coverage, never lose rows")
  }
}
