package graft.core.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** JSONL quarantine lane ([[Reader.readJsonQuarantine]]): corrupt lines
  * are captured with provenance, schema-evolution rows are NOT corrupt,
  * and the quarantine sink holds the raw lines byte-for-byte.
  */
class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("malformed lines quarantine; evolution rows and blanks do not") {
    val dir = Files.createTempDirectory("graft_quar").toString
    val lines = Seq(
      """{"id": 1, "v": "a"}""",
      """{"id": 2, "broken""",          // truncated — corrupt
      "",                               // blank — skipped
      """{"id": 3, "extra": true}""",   // valid json, missing v — good
      """not json""",                   // corrupt
      """{"id": 4, "v": "b"}""")
    lines.toDF("value").coalesce(1).write.text(s"$dir/in")
    val q = Reader.readJsonQuarantine(spark, s"$dir/in",
      "id BIGINT, v STRING", quarantineDir = Some(s"$dir/bad"))
    assert(q.good.count() == 3)
    assert(q.good.filter(col("v").isNull).select("id").as[Long].collect()
      .toSeq == Seq(3L))
    val bad = q.bad.collect()
    assert(bad.length == 2)
    assert(bad.forall(_.getAs[String]("source_file").nonEmpty))
    // the quarantine sink holds the exact raw lines
    val sunk = spark.read.text(s"$dir/bad").as[String].collect().toSet
    assert(sunk == Set("""{"id": 2, "broken""", "not json"))
    // declaring the reserved column is refused
    intercept[IllegalArgumentException] {
      Reader.readJsonQuarantine(spark, s"$dir/in",
        "id BIGINT, _corrupt_record STRING")
    }
  }

  test("csv lane: short rows, bad types, extra fields, bad quotes " +
      "quarantine; exact-width rows do not") {
    val dir = Files.createTempDirectory("graft_quarc").toString
    val lines = Seq(
      "1,apple,2.5",
      "2,banana",          // short — corrupt
      "x,pear,1.0",        // bad type — corrupt
      "3,kiwi,9.9,extra",  // extra field — corrupt
      "4,\"unclosed,5.0",  // bad quote — corrupt
      "5,plum,7.25")
    lines.toDF("value").coalesce(1).write.text(s"$dir/in")
    val q = Reader.readCsvQuarantine(spark, s"$dir/in",
      "id BIGINT, name STRING, price DOUBLE",
      quarantineDir = Some(s"$dir/bad"))
    assert(q.good.count() == 2)
    assert(q.good.select("id").as[Long].collect().toSet == Set(1L, 5L))
    assert(q.bad.count() == 4)
    assert(spark.read.text(s"$dir/bad").count() == 4)
    // streaming lane over the same files classifies identically
    val sq = graft.streaming.Streams.quarantineCsvStream(spark, s"$dir/in",
      "id BIGINT, name STRING, price DOUBLE")
    val sink = s"quarc_${System.nanoTime}"
    val run = sq.good.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try run.processAllAvailable() finally run.stop()
    assert(spark.table(sink).select("id").as[Long].collect().toSet ==
      Set(1L, 5L))
  }
}
