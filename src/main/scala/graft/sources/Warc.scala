package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader/writer — the container format
  * crawl corpora actually arrive in (Common Crawl ships WARC/WAT/WET
  * shards). Reference scope: yaetos has no crawl-native source; this is
  * part of the beyond-reference raw-crawl surface feeding
  * `WebText.htmlToText` → C4/Gopher.
  *
  * Read strategy: Spark's text source with the record delimiter
  * (`lineSep`) set to the `WARC/` magic, so each row is one raw record
  * and the scan SPLITS within uncompressed files like any text read —
  * header parsing is then pure codegen'd Column work (`substring_index`
  * + `regexp_extract`), no UDF, no driver parsing. At 100 TB: gzipped
  * shards (`.warc.gz`) are not splittable, so parallelism is per-file
  * there — exactly how Common Crawl is consumed (thousands of ~1 GB
  * shards); store uncompressed or in a splittable codec to split within
  * files.
  *
  * Caveat vs a sequential Content-Length parser: a payload that itself
  * contains the bytes `WARC/` after a blank line would mis-split. The
  * reader therefore validates `octet_length(payload)` against each
  * record's `Content-Length` header and surfaces `length_ok` — strict
  * consumers filter (or `require`) on it, so a pathological payload
  * reads as a FLAGGED record, never silent corruption.
  *
  * Scope: record headers + payload as text. Binary payloads (images in
  * `response` records) need the multimodal path (`ops.Multimodal`);
  * WET/extracted-text and WAT/metadata records — the LLM-pipeline
  * inputs — are text and fully covered here.
  */
object Warc {

  /** One row per WARC record: all headers as a `map<string,string>`,
    * the headers every pipeline filters on promoted to columns
    * (`warc_type`, `target_uri`, `record_id`, `warc_date`), the raw
    * `payload` (header block stripped, record terminator trimmed), and
    * the `length_ok` Content-Length validation flag. A malformed record
    * (no blank line) surfaces with a null payload rather than vanishing.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // Splitting on "WARC/" makes the version the first header line of
    // each row; the fragment before the first record (empty) fails the
    // version guard and drops.
    val raw = spark.read.option("lineSep", "WARC/").text(path)
      .filter(col("value").rlike("^[0-9.]+\r?\n"))
    val headerBlock = substring_index(col("value"), "\r\n\r\n", 1)
    // payload = everything after the first blank line, minus the two-CRLF
    // record terminator; records missing the blank line -> null payload
    val payload = when(col("value").contains("\r\n\r\n"),
      regexp_replace(
        col("value").substr(length(headerBlock) + 5,
          length(col("value"))),
        "\r\n\r\n$", ""))
    raw.select(
        split(headerBlock, "\r\n").as("hlines"),
        payload.as("payload"))
      .select(
        col("hlines").getItem(0).as("warc_version"),
        map_from_entries(filter(
          transform(slice(col("hlines"), lit(2), size(col("hlines"))), l => struct(
            substring_index(l, ":", 1).as("k"),
            ltrim(regexp_replace(l, "^[^:]*:", "")).as("v"))),
          e => e.getField("k") =!= "")).as("headers"),
        col("payload"))
      .select(
        col("warc_version"),
        col("headers").getItem("WARC-Type").as("warc_type"),
        col("headers").getItem("WARC-Target-URI").as("target_uri"),
        col("headers").getItem("WARC-Record-ID").as("record_id"),
        col("headers").getItem("WARC-Date").as("warc_date"),
        col("headers"),
        col("payload"),
        (col("headers").getItem("Content-Length").cast("long") <=>
          octet_length(col("payload")).cast("long")).as("length_ok"))
  }

  /** Render `(warc_type, target_uri, record_id, warc_date, payload)` as
    * one WARC record, version line through the end of the payload — the
    * record terminator (blank line) is appended by [[write]]'s `lineSep`
    * so records butt together per spec. Content-Length is the payload
    * OCTET length per ISO 28500.
    */
  def render(warcType: Column, targetUri: Column, recordId: Column,
             warcDate: Column, payload: Column): Column =
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), warcType, lit("\r\n"),
      lit("WARC-Target-URI: "), targetUri, lit("\r\n"),
      lit("WARC-Record-ID: "), recordId, lit("\r\n"),
      lit("WARC-Date: "), warcDate, lit("\r\n"),
      lit("Content-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"),
      payload)

  /** Write rows as a WARC shard set (one part-file per partition,
    * `\r\n\r\n`-terminated records). Reread with [[read]].
    */
  def write(df: DataFrame, cols: WarcCols, path: String,
            mode: String = "overwrite"): Unit =
    df.select(render(col(cols.warcType), col(cols.targetUri),
        col(cols.recordId), col(cols.warcDate), col(cols.payload))
        .as("value"))
      .write.mode(mode).option("lineSep", "\r\n\r\n").text(path)

  case class WarcCols(warcType: String = "warc_type",
                      targetUri: String = "target_uri",
                      recordId: String = "record_id",
                      warcDate: String = "warc_date",
                      payload: String = "payload")
}
