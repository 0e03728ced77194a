package graft.core.model

/** Declarative dataset description (reference manifest `inputs:`/`output:`
  * attrs — path/type/inc_field/glob/read_kwargs/pk/from,
  * reference conf/jobs_metadata.yml:13-16, yaetos/etl_utils.py:404-429).
  * All tabular data is a Spark DataFrame; `format` selects the reader/
  * writer ("csv" | "parquet" | "json" | "json_records" | "text" | "jdbc" |
  * "df" for in-memory handoff).
  */
/** One declarative pruning conjunct on an input (`skip_ranges:` entry):
  * an inclusive range (`lower`/`upper`, at least one), an IN-list
  * (`values`), or a non-null requirement (`not_null: true` — drops
  * files whose profiled column is entirely null). Bounds stay strings
  * at parse time; the reader types them (integer → BIGINT probe,
  * decimal → DOUBLE, else STRING — dates/timestamps ride the STRING
  * family's ISO ordering).
  */
final case class SkipRange(column: String,
                           lower: Option[String] = None,
                           upper: Option[String] = None,
                           values: Seq[String] = Nil,
                           notNull: Boolean = false)

final case class DatasetSpec(
    path: String = "",
    format: String = "parquet",
    incField: Option[String] = None,
    glob: Option[String] = None,
    readOptions: Map[String, String] = Map.empty,
    saveOptions: Map[String, String] = Map.empty,
    pk: Seq[String] = Nil,
    from: Option[String] = None,
    // planning-time file skipping (`skip_manifest:` + `skip_ranges:`):
    // a parquet input with a stats manifest routes through
    // graft.core.io.Skipping.read — explicit ranges plus the
    // incremental period filter prune files BEFORE the scan is planned
    skipManifest: Option[String] = None,
    skipRanges: Seq[SkipRange] = Nil,
    // `skip_blooms: true` — consult candidates' parquet footer bloom
    // filters for the IN-shaped skip_ranges after the manifest range
    // stage (graft.core.io.Skipping.pruneFiles footerBlooms)
    skipBlooms: Boolean = false,
    // write-path skipping maintenance (`stats_manifest:` +
    // `stats_cols:`): a parquet OUTPUT with a stats manifest ticks it
    // after every write — first write builds (footers-first,
    // graft.core.io.Skipping.maintainManifest), later writes/periods
    // delta-refresh at per-new-file metadata cost. stats_cols is
    // consulted only for the first build.
    statsManifest: Option[String] = None,
    statsCols: Seq[String] = Nil)

/** Declarative job description (one entry of the reference's
  * `conf/jobs_metadata.yml`): named inputs → transform (inline SQL, SQL
  * file, or registered class) → output, plus orchestration attrs.
  */
final case class JobSpec(
    name: String,
    inputs: Map[String, DatasetSpec] = Map.empty,
    output: Option[DatasetSpec] = None,
    sql: Option[String] = None,
    sqlFile: Option[String] = None,
    className: Option[String] = None,
    dependencies: Seq[String] = Nil,
    incrementalMode: String = "no_schema", // "no_schema" | "partitioned"
    repartition: Option[Int] = None,
    partitionBy: Seq[String] = Nil,
    params: Map[String, String] = Map.empty) {

  /** A job is incremental iff any input or the output declares inc_field
    * (reference yaetos/etl_utils.py:1034-1035).
    */
  def isIncremental: Boolean =
    inputs.values.exists(_.incField.nonEmpty) || output.exists(_.incField.nonEmpty)

  /** Whether the input named `inputName` chains from a same-named upstream
    * job's in-memory output: opts in via `type: df`, declares no (resolved)
    * path, or the job lists the upstream as a dependency. THE single
    * definition of the chaining rule — Etl.runJob input resolution and
    * Flow's persist refcounting both call this.
    */
  def chainsByName(inputName: String): Boolean =
    inputs.get(inputName).exists { d =>
      d.format == "df" ||
        Params.interpolate(d.path, params).isEmpty ||
        dependencies.contains(inputName)
    }
}

/** Recursive `{{param}}` interpolation with a depth guard (reference
  * Job_Args_Parser.replace_placeholders, yaetos/etl_utils.py:1051-1078).
  * Unknown keys are left intact so path templating (`{{latest}}`) can run
  * in a later pass.
  */
object Params {
  def interpolate(text: String, args: Map[String, String], maxDepth: Int = 100): String = {
    var cur = text
    var depth = 0
    var changed = true
    while (changed && depth < maxDepth) {
      val next = args.foldLeft(cur) { case (t, (k, v)) => t.replace(s"{{$k}}", v) }
      changed = next != cur
      cur = next
      depth += 1
    }
    cur
  }

  /** Interpolate every string field of a DatasetSpec. */
  def resolve(ds: DatasetSpec, args: Map[String, String]): DatasetSpec =
    ds.copy(
      path = interpolate(ds.path, args),
      glob = ds.glob.map(interpolate(_, args)),
      readOptions = ds.readOptions.map { case (k, v) => k -> interpolate(v, args) },
      saveOptions = ds.saveOptions.map { case (k, v) => k -> interpolate(v, args) },
      skipManifest = ds.skipManifest.map(interpolate(_, args)),
      skipRanges = ds.skipRanges.map(r => r.copy(
        lower = r.lower.map(interpolate(_, args)),
        upper = r.upper.map(interpolate(_, args)),
        values = r.values.map(interpolate(_, args)))))
}
