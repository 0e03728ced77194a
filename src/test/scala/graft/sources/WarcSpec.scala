package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC shard roundtrip: spec-shaped records, header-map parsing,
  * Content-Length validation (incl. the adversarial embedded-magic case
  * the split-based reader must FLAG rather than silently corrupt), and
  * multi-partition writes.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_warc").toString + "/shard"

  private def recs(rows: Seq[(String, String)]) =
    rows.toDF("target_uri", "payload")
      .select(lit("conversion").as("warc_type"), col("target_uri"),
        concat(lit("<urn:uuid:"), md5(col("target_uri")), lit(">")).as("record_id"),
        lit("2026-01-01T00:00:00Z").as("warc_date"), col("payload"))

  test("roundtrip preserves headers and payloads, incl. internal blank lines") {
    val rows = Seq(
      ("https://a.example/1", "hello world"),
      ("https://a.example/2", "line one\r\n\r\nline two after a blank line"),
      ("https://a.example/3", "unicode café über payload"))
    val out = tmp()
    Warc.write(recs(rows), Warc.WarcCols(), out)
    val back = Warc.read(spark, out)
      .select("target_uri", "warc_type", "payload", "length_ok")
      .orderBy("target_uri")
      .as[(String, String, String, Boolean)].collect()
    assert(back.map(r => (r._1, r._3)).toSeq == rows)
    assert(back.forall(_._2 == "conversion"))
    assert(back.forall(_._4), "every Content-Length must validate")
  }

  test("header map carries every header; promoted columns match it") {
    val out = tmp()
    Warc.write(recs(Seq(("https://h.example/x", "payload text"))),
      Warc.WarcCols(), out)
    val row = Warc.read(spark, out).collect().head
    assert(row.getAs[String]("warc_version") == "1.0")
    val headers = row.getAs[Map[String, String]]("headers")
    assert(headers("WARC-Type") == "conversion")
    assert(headers("WARC-Target-URI") == "https://h.example/x")
    assert(headers("Content-Length") == "12")
    assert(row.getAs[String]("target_uri") == headers("WARC-Target-URI"))
    assert(row.getAs[String]("warc_date") == "2026-01-01T00:00:00Z")
    assert(row.getAs[String]("record_id") == headers("WARC-Record-ID"))
  }

  test("payload embedding the WARC magic is FLAGGED, never silent") {
    val evil = "before\r\n\r\nWARC/1.0\r\nFake-Header: x\r\n\r\nafter"
    val out = tmp()
    Warc.write(recs(Seq(
      ("https://ok.example/1", "clean payload"),
      ("https://evil.example/2", evil))), Warc.WarcCols(), out)
    val back = Warc.read(spark, out)
    // the mis-split truncates the evil record AND fabricates a phantom:
    // both must carry length_ok = false; the clean record stays true
    assert(back.filter(col("length_ok")).count() == 1)
    assert(back.filter(col("length_ok"))
      .select("target_uri").as[String].head() == "https://ok.example/1")
    assert(back.filter(!col("length_ok")).count() >= 1)
  }

  test("the manifest reader dispatches format: warc") {
    val out = tmp()
    Warc.write(recs(Seq(("https://r.example/1", "via the Reader"))),
      Warc.WarcCols(), out)
    val df = graft.core.io.Reader.read(spark,
      graft.core.model.DatasetSpec(path = out, format = "warc"))
    assert(df.select("payload").as[String].head() == "via the Reader")
  }

  test("an Etl job with output type: warc lands a reread-able shard") {
    import graft.core.model.{DatasetSpec, JobSpec}
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_job").toString
    recs(Seq(("https://j.example/1", "job payload one"),
        ("https://j.example/2", "job payload two")))
      .write.parquet(s"$dir/in")
    val job = JobSpec(name = "wet_export",
      inputs = Map("recs" -> DatasetSpec(path = s"$dir/in", format = "parquet")),
      output = Some(DatasetSpec(path = s"$dir/out", format = "warc")),
      sql = Some("SELECT * FROM recs"))
    val res = graft.engine.Etl.runJob(spark, job, now = "r1")
    val back = Warc.read(spark, res.writtenPath.get).orderBy("target_uri")
      .select("target_uri", "payload", "length_ok")
      .as[(String, String, Boolean)].collect()
    assert(back.map(_._2).toSeq == Seq("job payload one", "job payload two"))
    assert(back.forall(_._3))
  }

  test(".warc.gz shards decompress transparently (per-file parallel read)") {
    val rows = Seq(("https://gz.example/1", "compressed payload one"),
      ("https://gz.example/2", "compressed payload two"))
    val out = tmp()
    recs(rows).select(Warc.render(col("warc_type"), col("target_uri"),
        col("record_id"), col("warc_date"), col("payload")).as("value"))
      .write.option("lineSep", "\r\n\r\n").option("compression", "gzip").text(out)
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".txt.gz")))
    val back = Warc.read(spark, out).orderBy("target_uri")
      .select("target_uri", "payload", "length_ok")
      .as[(String, String, Boolean)].collect()
    assert(back.map(r => (r._1, r._2)).toSeq == rows)
    assert(back.forall(_._3))
    // CommonCrawl's real layout names shards `<name>.warc.gz` — codec
    // detection keys on the trailing .gz, and the read must be
    // byte-identical to an uncompressed read of the same records
    val cc = tmp()
    new java.io.File(cc).mkdirs()
    new java.io.File(out).listFiles().filter(_.getName.endsWith(".txt.gz"))
      .zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(cc, f"shard-$i%05d.warc.gz").toPath) }
    val plain = tmp()
    recs(rows).select(Warc.render(col("warc_type"), col("target_uri"),
        col("record_id"), col("warc_date"), col("payload")).as("value"))
      .write.option("lineSep", "\r\n\r\n").text(plain)
    def all(p: String) = Warc.read(spark, p).orderBy("target_uri")
      .collect().map(_.toSeq).toSeq
    assert(all(cc) === all(plain),
      ".warc.gz read differs from the uncompressed read")
  }

  test("multi-partition shards reread completely") {
    val rows = (1 to 200).map(i => (f"https://m.example/$i%03d", s"payload number $i"))
    val out = tmp()
    Warc.write(recs(rows).repartition(7), Warc.WarcCols(), out)
    val back = Warc.read(spark, out)
    assert(back.count() == 200)
    assert(back.filter(!col("length_ok")).count() == 0)
    assert(back.select("target_uri").distinct().count() == 200)
  }
}
