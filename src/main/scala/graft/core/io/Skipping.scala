package graft.core.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.Path

/** Planning-time file skipping over plain parquet directories — the
  * min/max-stats manifest a table format (Delta/Iceberg) carries, for
  * layouts this engine writes itself ([[graft.ops.Layout.rangeSortedWrite]]
  * / [[graft.ops.Layout.zorderWrite]]).
  *
  * Why parquet's own footer pushdown is not enough at 100 TB: row-group
  * min/max skipping happens at READ time, file by file — the scan still
  * LISTS and OPENS every footer, and at ~1M files the per-file round
  * trips (object-store GETs, driver listing memory, a task per file)
  * dominate a selective query. The manifest is one small parquet table
  * (a row per file×column) consulted BEFORE the scan is planned, so a
  * range predicate over a range-clustered layout reads ~the matching
  * files only. The reference has no skipping layer at all — its
  * incremental jobs re-list whole folders (yaetos/etl_utils.py,
  * `FS_Ops_Dispatcher` path listing).
  *
  * SAFETY CONTRACT (what makes pruning sound):
  *  - [[read]] re-applies the range predicate ROW-level after pruning,
  *    so its result is exactly `spark.read.parquet(dir).filter(ranges)`
  *    even if the manifest is stale or lies.
  *  - Files present on disk but ABSENT from the manifest are always
  *    read (new arrivals since the last [[writeStatsManifest]] — the
  *    append/compaction window is conservative, never wrong).
  *  - Manifest rows whose file vanished (compaction, GDPR rewrite) are
  *    ignored.
  *  - A range on a column the manifest never profiled keeps every file.
  *  - A file whose stats row shows zero non-null values for a range's
  *    column IS prunable: a range predicate is null-rejecting.
  *
  * Stats are typed by family, never stringly compared across families:
  * integral columns keep exact BIGINT bounds (a double would round past
  * 2^53 and could shave a boundary file), floating keeps DOUBLE, and
  * strings/dates keep STRING (dates serialize ISO — lexicographic order
  * IS date order). Unsupported types get no stats row and are never
  * pruned on.
  */
object Skipping {

  /** One pruning conjunct: `lower <= col <= upper`, bounds optional and
    * inclusive. Values must match the column's stats family: Int/Long
    * for integral columns, Double for floating, String for
    * string/date-typed columns (dates in ISO `yyyy-MM-dd` form).
    */
  final case class ColumnRange(column: String,
                               lower: Option[Any] = None,
                               upper: Option[Any] = None) {
    require(lower.nonEmpty || upper.nonEmpty,
      s"ColumnRange($column) needs at least one bound")
  }

  final case class Pruned(keptFiles: Seq[String], manifestFiles: Int,
                          unlistedFiles: Int) {
    def readFiles: Int = keptFiles.length
  }

  private val statsFamilies: PartialFunction[DataType, String] = {
    case ByteType | ShortType | IntegerType | LongType => "long"
    case FloatType | DoubleType => "dbl"
    case _: DecimalType => "dbl"
    case StringType => "str"
    case DateType => "str" // ISO string: lexicographic == chronological
  }

  /** Profile `dataDir`'s parquet files into a manifest at `manifestDir`:
    * a row per (file, column) with `n_rows`, `n_vals` (non-null count)
    * and family-typed min/max. ONE scan of the data regardless of how
    * many columns are profiled (per-file aggregation, then an in-plan
    * unpivot). Columns of unsupported types are skipped. Returns the
    * number of files profiled.
    *
    * Re-run after appends or compaction; between runs the conservative
    * unlisted-file rule in [[pruneFiles]] keeps results exact.
    */
  def writeStatsManifest(spark: SparkSession, dataDir: String,
                         cols: Seq[String], manifestDir: String): Long = {
    require(cols.nonEmpty, "profile at least one column")
    val df = spark.read.parquet(dataDir)
    val profiled = cols.map { c =>
      val dt = df.schema(c).dataType // throws on unknown column: fail loud
      c -> statsFamilies.lift(dt)
    }.collect { case (c, Some(fam)) => c -> fam }
    require(profiled.nonEmpty,
      s"none of ${cols.mkString(",")} has a skippable type")
    profileFiles(df, profiled)
      .coalesce(1).write.mode("overwrite").parquet(manifestDir)
    spark.read.parquet(manifestDir).select("file").distinct().count()
  }

  final case class ManifestDelta(profiledFiles: Int, droppedFiles: Int,
                                 totalFiles: Long)

  /** Refresh an existing manifest against the directory's CURRENT file
    * set by profiling ONLY the files the manifest has never seen and
    * dropping rows for files that vanished (compaction / GDPR rewrite).
    * This is the steady-state maintenance path: [[writeStatsManifest]]
    * rescans the whole directory (corpus-linear — the build cost), an
    * append tick costs ~the new files. Profiled columns and families
    * are inherited from the manifest itself, so build and append can
    * never diverge on what is indexed.
    *
    * The combined manifest lands via a staged-directory swap. A crash
    * between delete and rename leaves the manifest MISSING (reads fail
    * loud, never stale-wrong); the manifest is a derived artifact — the
    * heal is a [[writeStatsManifest]] rebuild. A reader racing the swap
    * sees either generation; both are conservative (a file absent from
    * whichever generation it reads is scanned, not skipped).
    */
  def appendStatsManifest(spark: SparkSession, dataDir: String,
                          manifestDir: String): ManifestDelta = {
    val onDisk = listParquet(spark, dataDir)
    val diskKeys = onDisk.map(pathKey).toSet
    val manifest = spark.read.parquet(manifestDir)
    val profiled = manifest.select("column", "family").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq.sortBy(_._1)
    val oldKeys = manifest.select("file").distinct()
      .collect().map(r => pathKey(r.getString(0))).toSet
    val newFiles = onDisk.filterNot(f => oldKeys.contains(pathKey(f)))
    val dropped = (oldKeys -- diskKeys).size
    if (newFiles.isEmpty && dropped == 0)
      return ManifestDelta(0, 0, oldKeys.size.toLong)
    // scheme-normalize in-plan so kept-row matching never collects the
    // (files × columns) manifest to the driver
    import spark.implicits._
    val keyCol = regexp_replace(col("file"),
      lit("^[a-zA-Z][a-zA-Z0-9+.-]*:/+"), lit("/"))
    // no broadcast hint: AQE broadcasts the key list while it is small
    // and degrades to a shuffle semi-join at listing scale
    val keep = manifest.join(
      diskKeys.toSeq.toDF("_k"), keyCol === col("_k"), "left_semi")
    val fresh =
      if (newFiles.isEmpty) keep.limit(0)
      else profileFiles(spark.read
        .schema(spark.read.parquet(dataDir).schema)
        .parquet(newFiles: _*), profiled)
    val staged = manifestDir.stripSuffix("/") + "_staged"
    keep.unionByName(fresh).coalesce(1)
      .write.mode("overwrite").parquet(staged)
    val fs = new Path(manifestDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(manifestDir), true)
    require(fs.rename(new Path(staged), new Path(manifestDir)),
      s"manifest swap failed: $staged -> $manifestDir")
    ManifestDelta(newFiles.size, dropped,
      spark.read.parquet(manifestDir).select("file").distinct().count())
  }

  /** Shared profiling core: per-file aggregation (ONE scan regardless of
    * column count) + in-plan unpivot to the manifest's
    * (file, column, family, typed min/max) rows.
    */
  private def profileFiles(df: DataFrame,
                           profiled: Seq[(String, String)]): DataFrame = {
    val aggs = profiled.flatMap { case (c, fam) =>
      val v = fam match {
        case "long" => col(c).cast("long")
        case "dbl" => col(c).cast("double")
        case "str" => col(c).cast("string")
      }
      Seq(min(v).as(s"_min_$c"), max(v).as(s"_max_$c"),
        count(v).as(s"_vals_$c"))
    }
    val allAggs = count(lit(1)).as("_rows") +: aggs
    val perFile = df
      .withColumn("_file", input_file_name())
      .groupBy("_file")
      .agg(allAggs.head, allAggs.tail: _*)
    val rows = profiled.map { case (c, fam) =>
      def slot(f: String, v: Column) =
        if (fam == f) v else lit(null).cast(if (f == "long") "long"
          else if (f == "dbl") "double" else "string")
      struct(lit(c).as("column"), lit(fam).as("family"),
        col(s"_vals_$c").cast("long").as("n_vals"),
        slot("long", col(s"_min_$c")).as("min_long"),
        slot("long", col(s"_max_$c")).as("max_long"),
        slot("dbl", col(s"_min_$c")).as("min_dbl"),
        slot("dbl", col(s"_max_$c")).as("max_dbl"),
        slot("str", col(s"_min_$c")).as("min_str"),
        slot("str", col(s"_max_$c")).as("max_str"))
    }
    perFile.select(col("_file").as("file"),
        col("_rows").cast("long").as("n_rows"),
        explode(array(rows: _*)).as("s"))
      .select(col("file"), col("n_rows"), col("s.*"))
  }

  /** The file set a conjunction of ranges cannot rule out. Overlap runs
    * as a Spark job over the (bounded, files×columns) manifest; only the
    * surviving file NAMES reach the driver — the same order of driver
    * state Spark's own FileIndex holds for the pruned scan.
    */
  def pruneFiles(spark: SparkSession, dataDir: String, manifestDir: String,
                 ranges: Seq[ColumnRange]): Pruned = {
    require(ranges.nonEmpty, "pruneFiles needs at least one range")
    // URI spellings differ between input_file_name() (`file:///…`) and
    // FileSystem.listStatus (`file:/…`) — compare scheme-stripped paths,
    // read through the disk listing's spelling
    val onDisk = listParquet(spark, dataDir)
    val byKey = onDisk.map(f => pathKey(f) -> f).toMap
    val manifest = spark.read.parquet(manifestDir)
    // a file is excluded if ANY range proves it cannot hold a match
    val exclusions = ranges.map { r =>
      val m = manifest.filter(col("column") === r.column)
      val noVals = col("n_vals") === 0L // all-null: range preds reject null
      val below = r.upper.map(v => boundCol(m, v, "min") > lit(v))
        .getOrElse(lit(false))
      val above = r.lower.map(v => boundCol(m, v, "max") < lit(v))
        .getOrElse(lit(false))
      m.filter(noVals || below || above).select("file")
    }.reduce(_ unionByName _).distinct()
    val listed = manifest.select("file").distinct()
    val keptKeys = listed.exceptAll(exclusions)
      .collect().map(r => pathKey(r.getString(0))).toSet
    val listedKeys = listed.collect().map(r => pathKey(r.getString(0))).toSet
    val kept = onDisk.filter(f => keptKeys.contains(pathKey(f)))
    val unlisted = onDisk.filterNot(f => listedKeys.contains(pathKey(f)))
    Pruned((kept ++ unlisted).sorted,
      manifestFiles = listedKeys.size, unlistedFiles = unlisted.size)
  }

  /** Pruned scan + row-level re-filter: semantically identical to
    * `spark.read.parquet(dataDir).filter(ranges)` while reading only
    * [[pruneFiles]]' survivors. This is the only read entry point —
    * exposing the pruned-but-unfiltered frame would make a stale
    * manifest a correctness bug instead of a lost optimization.
    */
  def read(spark: SparkSession, dataDir: String, manifestDir: String,
           ranges: Seq[ColumnRange]): DataFrame = {
    val pruned = pruneFiles(spark, dataDir, manifestDir, ranges)
    val full = spark.read.parquet(dataDir)
    val rowFilter = ranges.map { r =>
      val c = col(r.column)
      (r.lower.map(v => c >= lit(v)) ++ r.upper.map(v => c <= lit(v)))
        .reduce(_ && _)
    }.reduce(_ && _)
    if (pruned.keptFiles.isEmpty) full.filter(lit(false))
    else spark.read.schema(full.schema)
      .parquet(pruned.keptFiles: _*).filter(rowFilter)
  }

  /** Typed bound column for a range value: integral range values probe
    * the BIGINT slots, doubles the DOUBLE slots, strings the STRING
    * slots. A family mismatch (e.g. a String bound on a profiled-long
    * column) leaves the typed slot null — null comparisons are false, so
    * the file is KEPT: wrong-typed ranges degrade to no pruning, never
    * to a wrong drop.
    */
  private def boundCol(m: DataFrame, value: Any, side: String): Column =
    value match {
      case _: Int | _: Long | _: java.lang.Integer | _: java.lang.Long =>
        col(s"${side}_long")
      case _: Double | _: Float => col(s"${side}_dbl")
      case _: String => col(s"${side}_str")
      case other => throw new IllegalArgumentException(
        s"unsupported range bound type: ${other.getClass.getName}")
    }

  /** Scheme/authority-stripped path: the equality key across URI
    * spellings of the same file.
    */
  private def pathKey(s: String): String = new Path(s).toUri.getPath

  private def listParquet(spark: SparkSession, dataDir: String): Seq[String] = {
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.toString).toSeq
  }
}
