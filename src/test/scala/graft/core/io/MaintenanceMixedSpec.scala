package graft.core.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** compactIncrements keepLatest under a MIXED-layout sink: the newest
  * dir of EACH kind keeps its replay-tail protection — one stray dir
  * (which sorts last under the unknown kind) must never displace the
  * live batch tail from the keep set.
  */
class MaintenanceMixedSpec extends SparkSpec {
  import spark.implicits._

  private def files(root: String, dir: String): Int =
    new java.io.File(s"$root/$dir").listFiles()
      .count(_.getName.endsWith(".parquet"))

  test("keepLatest protects each layout kind independently") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mixed").toString
    val df = (1 to 100).map(_.toDouble).toDF("v")
    (0 until 3).foreach(i => df.repartition(3).write.parquet(s"$root/batch$i"))
    Seq("inc_20240101_000000_day", "inc_20240102_000000_day")
      .foreach(d => df.repartition(3).write.parquet(s"$root/$d"))
    df.repartition(3).write.parquet(s"$root/adhoc_export")

    val rep = Maintenance.compactIncrements(spark, root, keepLatest = 1)
    // closed dirs of each kind compact: batch0, batch1, inc_…01
    assert(rep.dirsCompacted === 3, s"got $rep")
    assert(files(root, "batch0") === 1 && files(root, "batch1") === 1)
    assert(files(root, "inc_20240101_000000_day") === 1)
    // the newest of EACH kind is spared — batch2 (the live batch tail,
    // the dir the stray would have displaced under a global dropRight),
    // the newest increment, and the stray itself
    assert(files(root, "batch2") === 3)
    assert(files(root, "inc_20240102_000000_day") === 3)
    assert(files(root, "adhoc_export") === 3)
  }
}
