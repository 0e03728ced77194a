package graft.core.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.model.DatasetSpec

/** Format-dispatched dataset reader (reference load_input,
  * yaetos/etl_utils.py:356-429 and pandas loaders
  * yaetos/pandas_utils.py:28-82, collapsed onto `spark.read`).
  *
  * Defaults mirror the reference: CSV reads with header=true and all
  * string columns (inferSchema is opt-in via read_kwargs so SQL implicit
  * casts behave identically to the reference's string-typed frames);
  * glob suffixes append to the path; `json_records` unwraps the
  * `{"records": [...]}` envelope (reference conf/jobs_metadata.yml:316-322).
  */
object Reader {

  /** `period` (as a `[from, until)` day pair) reaches the JDBC source as a
    * database-side WHERE — only one period's rows cross the wire on an
    * incremental pass; a parquet input with a `skip_manifest` turns the
    * same pair into a planning-time FILE prune (see [[skipPredicates]]).
    * Other file formats ignore it (their period restriction is the
    * pushdown-eligible [[graft.ops.Incremental.periodFilter]]).
    */
  def read(spark: SparkSession, ds: DatasetSpec,
           period: Option[(String, String)] = None): DataFrame = {
    val path = ds.glob.map(g => s"${ds.path.stripSuffix("/")}/$g").getOrElse(ds.path)
    lazy val preds = skipPredicates(ds, period)
    ds.format match {
      case "csv" =>
        spark.read.option("header", "true")
          .options(ds.readOptions).csv(path)
      case "parquet" if ds.skipManifest.nonEmpty && preds.nonEmpty =>
        require(ds.glob.isEmpty, "skip_manifest needs a directory input — " +
          "glob patterns and manifest file listings cannot compose")
        Skipping.read(spark, ds.path, ds.skipManifest.get, preds,
          ds.readOptions, footerBlooms = ds.skipBlooms)
      case "parquet" => spark.read.options(ds.readOptions).parquet(path)
      case "orc" => spark.read.options(ds.readOptions).orc(path)
      case "json" => spark.read.options(ds.readOptions).json(path)
      case "json_array" => // whole-file `[ {...}, ... ]` layout
        spark.read.option("multiLine", "true").options(ds.readOptions).json(path)
      case "json_records" =>
        spark.read.option("multiLine", "true").options(ds.readOptions).json(path)
          .select(explode(col("records")).as("r")).select("r.*")
      case "text" => spark.read.options(ds.readOptions).text(path)
      // crawl-native shards (ISO 28500): one row per record, headers
      // parsed to columns + map; see graft.sources.Warc for the scale
      // notes (uncompressed shards split; .warc.gz is per-file parallel)
      case "warc" => graft.sources.Warc.read(spark, path)
      case "excel" =>
        // `header` here is the 0-based header ROW INDEX (pandas read_excel
        // semantics), not csv's has-header boolean; "true" maps to row 0.
        val headerRow = ds.readOptions.get("header") match {
          case None | Some("true") => 0
          case Some(v) => v.toIntOption.getOrElse(sys.error(
            s"excel read option header must be a row index (or 'true'), got '$v'"))
        }
        require(ds.glob.isEmpty, "glob is not supported for excel inputs " +
          "(driver-side single-file parse); list files and union explicitly")
        graft.sources.Excel.read(spark, ds.path, headerRow)
      // fromSpec expands preset shorthand and owns all jdbc option
      // handling — one code path for manifest reads and direct calls
      case "jdbc" => graft.sources.Jdbc.fromSpec(spark, ds, period)
      // HTTP extraction (S11): `path` is the URL; driver-side fetch, then
      // spark.read over the landed bytes. Gzip auto-detected.
      case "http_csv" => graft.sources.Http.readCsv(spark, ds.path,
        options = ds.readOptions)
      case "http_json" => graft.sources.Http.readJson(spark, ds.path,
        options = ds.readOptions)
      case "http_paginated" => graft.sources.Http.readPaginatedJson(spark, ds.path,
        maxPages = ds.readOptions.get("maxPages").flatMap(_.toIntOption).getOrElse(1000))
      case other => sys.error(s"unsupported input format: $other")
    }
  }

  /** The pruning conjunction a `skip_manifest` input sends to
    * [[Skipping.read]]: the declared `skip_ranges` plus — when the input
    * is incremental and a period is being processed — the period's
    * `[from, until]` window on `inc_field`, so each incremental pass
    * plans a scan over ~one period's files instead of re-listing and
    * re-opening the whole history (the manifest-level analog of the
    * reference's `{{latest}}` path selection). The window is the
    * conservative inclusive hull; [[graft.ops.Incremental.periodFilter]]
    * still applies the exact row-level restriction downstream.
    *
    * YAML bounds are strings; they are typed here by parse — integer →
    * BIGINT probe, decimal → DOUBLE, anything else STRING (dates ride
    * the STRING family's ISO lexicographic order). A numeric-LOOKING
    * bound on a string-profiled column therefore probes the wrong slot
    * and degrades to no pruning — quote-proofing it is not expressible
    * in YAML; profile such columns as strings or rename the bound.
    */
  private[graft] def skipPredicates(
      ds: DatasetSpec,
      period: Option[(String, String)]): Seq[Skipping.FilePredicate] = {
    def typed(s: String): Any =
      s.toLongOption.getOrElse(s.toDoubleOption.getOrElse(s))
    val declared = ds.skipRanges.map { r =>
      if (r.notNull) {
        require(r.values.isEmpty && r.lower.isEmpty && r.upper.isEmpty,
          s"skip_ranges ${r.column}: not_null excludes values/lower/upper" +
            " (declare them as separate conjuncts)")
        Skipping.ColumnNotNull(r.column)
      } else if (r.values.nonEmpty) {
        require(r.lower.isEmpty && r.upper.isEmpty,
          s"skip_ranges ${r.column}: values excludes lower/upper")
        Skipping.ColumnIn(r.column, r.values.map(typed))
      } else Skipping.ColumnRange(r.column,
        r.lower.map(typed), r.upper.map(typed))
    }
    val periodRange = (ds.incField, period) match {
      case (Some(f), Some((from, until))) =>
        Seq(Skipping.ColumnRange(f, Some(from), Some(until)))
      case _ => Nil
    }
    declared ++ periodRange
  }

  final case class Quarantined(good: DataFrame, bad: DataFrame)

  /** JSONL ingestion with a quarantine lane: parse every line against
    * `schemaDdl`; lines that are not valid JSON go to `bad` (raw text +
    * source file) instead of poisoning or silently vanishing from the
    * load. At 100 TB some shard WILL be truncated — the quarantine lane
    * is how a nightly load survives it with an audit trail instead of a
    * 3 a.m. page.
    *
    * Built on a text scan + row-local `from_json` with a corrupt-record
    * column in its TARGET schema — not the json file reader's PERMISSIVE
    * `_corrupt_record`, which cannot be referenced without caching the
    * whole frame first (a 100 TB non-starter). Malformed JSON lands with
    * the raw line in the corrupt column; VALID json whose fields merely
    * miss the schema parses to field-level nulls (schema evolution, not
    * corruption) and stays in `good`. Blank lines are skipped. When
    * `quarantineDir` is set, bad rows are also written there (text, one
    * raw line per row) before returning.
    */
  def readJsonQuarantine(spark: SparkSession, path: String, schemaDdl: String,
                         quarantineDir: Option[String] = None): Quarantined = {
    val q = quarantineSplit(spark.read.text(path), schemaDdl)
    quarantineDir.foreach(d =>
      q.bad.select("raw_line").write.mode("overwrite").text(d))
    q
  }

  /** CSV flavor of [[readJsonQuarantine]]: headerless CSV lines parsed
    * row-locally with `from_csv`, which flags short rows, type
    * mismatches, EXTRA fields, and unclosed quotes as corrupt — a
    * stricter contract than the csv reader's PERMISSIVE null-filling,
    * which silently absorbs most of those. Same lanes, same sink.
    */
  def readCsvQuarantine(spark: SparkSession, path: String, schemaDdl: String,
                        quarantineDir: Option[String] = None): Quarantined = {
    val q = quarantineSplit(spark.read.text(path), schemaDdl, isJson = false)
    quarantineDir.foreach(d =>
      q.bad.select("raw_line").write.mode("overwrite").text(d))
    q
  }

  /** The row-local good/bad classification behind [[readJsonQuarantine]]
    * / [[readCsvQuarantine]] — shared with the STREAMING lane
    * ([[graft.streaming.Streams.quarantineJsonStream]]), which is the
    * point: every transformation here is stateless, so the identical
    * code classifies a bounded load and an unbounded one.
    */
  private[graft] def quarantineSplit(raw: DataFrame, schemaDdl: String,
                                     isJson: Boolean = true): Quarantined = {
    require(!schemaDdl.contains("_corrupt_record"),
      "schemaDdl must not declare _corrupt_record — the quarantine lane adds it")
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL(s"$schemaDdl, _corrupt_record STRING")
    val opts = Map("columnNameOfCorruptRecord" -> "_corrupt_record")
    val parser =
      if (isJson) from_json(col("value"), schema, opts)
      else from_csv(col("value"), schema, opts)
    val parsed = raw
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), input_file_name().as("_file"), parser.as("_j"))
    val good = parsed.filter(col("_j._corrupt_record").isNull)
      .select("_j.*").drop("_corrupt_record")
    val bad = parsed.filter(col("_j._corrupt_record").isNotNull)
      .select(col("value").as("raw_line"), col("_file").as("source_file"))
    Quarantined(good, bad)
  }

  /** Multi-path scan: expand a `{param}` template over given combos and
    * union with a `_source` column (reference ex15 multi-path copy +
    * the pandas multi-file `_source` concat, yaetos/pandas_utils.py:28-39).
    */
  def readMultiPath(spark: SparkSession, ds: DatasetSpec,
                    combos: Seq[Map[String, String]]): DataFrame =
    combos.map { combo =>
      val p = combo.foldLeft(ds.path) { case (t, (k, v)) => t.replace(s"{$k}", v) }
      read(spark, ds.copy(path = p)).withColumn("_source", lit(p))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
}
