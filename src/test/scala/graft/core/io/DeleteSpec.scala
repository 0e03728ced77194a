package graft.core.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Targeted delete ([[Maintenance.deleteMatching]]): file-pruned rewrite,
  * untouched-file identity, partitioned layouts, and crash recovery on
  * both sides of the manifest commit point.
  */
class DeleteSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_del").toString

  private def fileStamps(dir: String): Map[String, (Long, Long)] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("deleteMatching rewrites only the files holding matches") {
    val dir = tmp()
    val ds = s"$dir/data"
    // range-partitioned on id: ids 0..9999 in 10 files of 1000 — the
    // delete list (ids 100..199) lands entirely in one file
    spark.range(0, 10000).toDF("id").withColumn("v", col("id") % 13)
      .repartitionByRange(10, col("id")).write.parquet(ds)
    val before = fileStamps(ds)
    assert(before.size == 10)
    val ids = spark.range(100, 200).toDF("id")
    val res = Maintenance.deleteMatching(spark, ds, "id", ids)
    assert(res.filesTotal == 10)
    assert(res.filesAffected < 10 && res.filesAffected >= 1)
    assert(res.rowsDeleted == 100)
    val after = fileStamps(ds)
    // every unaffected file is byte-identical: same name, size, mtime
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size == before.size - res.filesAffected)
    untouched.foreach(n => assert(before(n) == after(n)))
    val back = spark.read.parquet(ds)
    assert(back.count() == 9900)
    assert(back.filter(col("id").between(100, 199)).count() == 0)
    assert(back.agg(sum("v")).head().getLong(0) ==
      spark.range(0, 10000).toDF("id").withColumn("v", col("id") % 13)
        .filter(!col("id").between(100, 199))
        .agg(sum("v")).head().getLong(0))
    // no swap debris
    val names = new java.io.File(ds).listFiles().map(_.getName)
    assert(!names.exists(_.contains("_delete")))
    assert(!names.exists(_.endsWith("_deleted")))
  }

  test("deleteMatching statsManifest tick: the manifest equals a rebuild " +
      "after the forget and keeps pruning") {
    val dir = tmp()
    val ds = s"$dir/data"
    spark.range(0, 10000).toDF("id").withColumn("v", col("id") % 13)
      .repartitionByRange(10, col("id")).write.parquet(ds)
    Skipping.writeStatsManifest(spark, ds, Seq("id"), s"$dir/mf")
    val res = Maintenance.deleteMatching(spark, ds, "id",
      spark.range(100, 200).toDF("id"), statsManifest = Some(s"$dir/mf"))
    assert(res.rowsDeleted === 100L)
    val rebuilt = s"$dir/mf_rebuilt"
    Skipping.writeStatsManifest(spark, ds, Seq("id"), rebuilt)
    val got = spark.read.parquet(s"$dir/mf").collect().map(_.toSeq).toSet
    val want = spark.read.parquet(rebuilt).collect().map(_.toSeq).toSet
    assert(got === want, "forget + tick must equal the rebuild")
    val pr = Skipping.pruneFiles(spark, ds, s"$dir/mf",
      Seq(Skipping.ColumnRange("id", Some(5000L), Some(5999L))))
    // <= 2, not == 1: repartitionByRange samples its boundaries, so the
    // probed range may legitimately straddle one file edge
    assert(pr.unlistedFiles === 0 && pr.readFiles <= 2 &&
      pr.readFiles < pr.manifestFiles,
      s"rewritten files stay listed with tight bounds, " +
        s"read ${pr.readFiles} of ${pr.manifestFiles}")
  }

  test("a bulk delete trips the affected-file cap instead of collecting " +
      "a table-sized file list") {
    val dir = tmp()
    val ds = s"$dir/data"
    spark.range(0, 1000).toDF("id").repartition(8).write.parquet(ds)
    val before = fileStamps(ds)
    // every file matches: with a cap below the file count, fail loudly
    // and leave the data untouched
    val err = intercept[IllegalArgumentException] {
      Maintenance.deleteMatching(spark, ds, "id",
        spark.range(0, 1000).toDF("id"), maxAffectedFiles = 4)
    }
    assert(err.getMessage.contains("bulk delete"))
    assert(fileStamps(ds) == before)
    // with the cap sized for it, the same delete proceeds
    val res = Maintenance.deleteMatching(spark, ds, "id",
      spark.range(0, 1000).toDF("id"), maxAffectedFiles = 8)
    assert(res.rowsDeleted == 1000)
  }

  test("deleteMatching with no matches touches nothing") {
    val dir = tmp()
    val ds = s"$dir/data"
    spark.range(0, 100).toDF("id").repartition(4).write.parquet(ds)
    val before = fileStamps(ds)
    val res = Maintenance.deleteMatching(spark, ds, "id",
      spark.range(5000, 5010).toDF("id"))
    assert(res.filesAffected == 0 && res.rowsDeleted == 0)
    assert(fileStamps(ds) == before)
  }

  test("deleteMatching prunes partition directories in a hive layout") {
    val dir = tmp()
    val ds = s"$dir/data"
    spark.range(0, 1000).toDF("id")
      .withColumn("p", (col("id") % 4).cast("int"))
      .write.partitionBy("p").parquet(ds)
    // delete ids that all live in p=1 (id % 4 == 1)
    val ids = spark.range(0, 1000).toDF("id").filter(col("id") % 4 === 1)
      .limit(50)
    val otherStamps = Seq(0, 2, 3).map(p => p -> fileStamps(s"$ds/p=$p")).toMap
    val res = Maintenance.deleteMatching(spark, ds, "id", ids)
    assert(res.rowsDeleted == 50)
    // untouched partitions keep identical files
    Seq(0, 2, 3).foreach(p => assert(fileStamps(s"$ds/p=$p") == otherStamps(p)))
    val back = spark.read.parquet(ds)
    assert(back.count() == 950)
    // partition column survives the per-directory rewrite
    assert(back.filter(col("p") === 1).count() == 250 - 50)
  }

  test("partition column as delete key fails loudly") {
    val dir = tmp()
    val ds = s"$dir/data"
    spark.range(0, 100).toDF("id")
      .withColumn("p", (col("id") % 2).cast("int"))
      .write.partitionBy("p").parquet(ds)
    val err = intercept[IllegalArgumentException] {
      Maintenance.deleteMatching(spark, ds, "p",
        spark.range(0, 1).select(lit(1).cast("int").as("p")))
    }
    assert(err.getMessage.contains("partition"))
  }

  test("datasetReport flags small-file accumulation and clears after " +
      "compaction") {
    val dir = tmp()
    val ds = s"$dir/data"
    spark.range(0, 50000).toDF("id").repartition(40).write.parquet(ds)
    val before = Maintenance.datasetReport(spark, ds,
      targetFileBytes = 512L * 1024)
    assert(before.size == 1 && before.head.files == 40)
    assert(before.head.advice == "compact")
    Maintenance.compactParquet(spark, ds, targetFileBytes = 512L * 1024)
    val after = Maintenance.datasetReport(spark, ds,
      targetFileBytes = 512L * 1024)
    assert(after.head.advice == "ok", after.head.toString)
    assert(after.head.files < 40)
    // hive layout: one report row per partition dir
    val ds2 = s"$dir/part"
    spark.range(0, 100).toDF("id")
      .withColumn("p", (org.apache.spark.sql.functions.col("id") % 2)
        .cast("int"))
      .write.partitionBy("p").parquet(ds2)
    val rep2 = Maintenance.datasetReport(spark, ds2)
    assert(rep2.size == 2 && rep2.forall(_.files > 0))
  }

  test("crash before the manifest rolls back; after it rolls forward") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

    // -- rollback: tmp dir without a manifest must vanish, data intact
    val d1 = tmp()
    spark.range(0, 100).toDF("id").coalesce(1).write.parquet(s"$d1/data")
    val t1 = new Path(s"$d1/data/.data_delete_tmp")
    fs.mkdirs(t1)
    spark.range(0, 1).toDF("id").coalesce(1).write
      .mode("overwrite").parquet(t1.toString)
    val r1 = Maintenance.deleteMatching(spark, s"$d1/data", "id",
      spark.range(900, 901).toDF("id"))
    assert(r1.rowsDeleted == 0)
    assert(!fs.exists(t1))
    assert(spark.read.parquet(s"$d1/data").count() == 100)

    // -- roll forward: manifest present means committed — the hidden
    // original must be replaced by the tmp contents on the next run
    val d2 = tmp()
    spark.range(0, 100).toDF("id").coalesce(1).write.parquet(s"$d2/data")
    val orig = new java.io.File(s"$d2/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    val t2 = new Path(s"$d2/data/.data_delete_tmp")
    spark.range(0, 60).toDF("id").coalesce(1).write
      .mode("overwrite").parquet(t2.toString)
    val out = fs.create(new Path(t2, "_delete_plan.json"), true)
    out.write(s"""["$orig"]""".getBytes("UTF-8")); out.close()
    // next delete run (no matches itself) completes the crashed swap first
    val r2 = Maintenance.deleteMatching(spark, s"$d2/data", "id",
      spark.range(900, 901).toDF("id"))
    assert(r2.rowsDeleted == 0)
    assert(!fs.exists(t2))
    assert(spark.read.parquet(s"$d2/data").count() == 60)
  }
}
