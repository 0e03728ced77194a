package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.core.model.DatasetSpec

/** JDBC source/sink option builders (reference MySQL/ClickHouse/Redshift
  * readers, yaetos/etl_utils.py:504-577 and push jobs
  * yaetos/redshift_spark.py, clickhouse.py).
  *
  * No database ships in this environment, so these build the exact option
  * maps Spark's JDBC relation consumes — the part the reference owns —
  * and the read/write calls are thin dispatch. Incremental reads push the
  * period predicate into the database query (the reference's
  * `WHERE inc >= period AND inc < period_next`, fetchsize 10000,
  * numPartitions 3 — yaetos/etl_utils.py:525-536).
  */
object Jdbc {

  val defaultFetchSize = "10000"
  val defaultNumPartitions = "3"

  /** Per-database dialect preset: driver class + URL shape + default port,
    * so a caller (or manifest) supplies only host/database/credentials.
    * These pin exactly what the reference hardcodes per connector:
    * mysql `com.mysql.cj.jdbc.Driver` + `jdbc:mysql://host:port/db`
    * (etl_utils.py:509-517), ClickHouse spoken over its PostgreSQL-wire
    * port with the postgres driver (etl_utils.py:545-552), Redshift's
    * `jdbc:redshift:` scheme (redshift_spark.py:13), Oracle thin
    * (ex5_input_from_oracle_job.py). The reference's Redshift push also
    * stages through an S3 `tempdir` via the spark-redshift connector —
    * on the generic JDBC fallback that option is simply carried through
    * in `extra` when the connector jar is on the cluster classpath.
    */
  final case class DbPreset(driver: String, defaultPort: Int,
                            mkUrl: (String, Int, String) => String,
                            databaseRequired: Boolean = false) {
    def url(host: String, database: String, port: Int = 0): String =
      mkUrl(host, if (port > 0) port else defaultPort, database)
    /** Connection options for Spark's JDBC source — merge as `extra` into
      * [[fullTableOptions]]/[[incrementalOptions]]/[[partitionedOptions]].
      */
    def connOptions(host: String, database: String, user: String,
                    password: String, port: Int = 0): Map[String, String] =
      Map("url" -> url(host, database, port), "driver" -> driver,
        "user" -> user, "password" -> password)
  }

  val mysql: DbPreset = DbPreset("com.mysql.cj.jdbc.Driver", 3306,
    (h, p, d) => s"jdbc:mysql://$h:$p/$d")
  // ClickHouse over its PostgreSQL-compatibility port (9005), like the
  // reference — a native clickhouse-jdbc driver can override via `driver`
  // in extra
  val clickhouse: DbPreset = DbPreset("org.postgresql.Driver", 9005,
    (h, p, d) => s"jdbc:postgresql://$h:$p/$d")
  // Redshift requires the database in the URL; Oracle thin needs a
  // service name — both fail at expansion when it's missing. The others
  // tolerate an empty path (mysql/postgres default the database
  // driver/server-side), so omitting `database` stays valid there.
  val redshift: DbPreset = DbPreset("com.amazon.redshift.jdbc42.Driver", 5439,
    (h, p, d) => s"jdbc:redshift://$h:$p/$d", databaseRequired = true)
  val oracle: DbPreset = DbPreset("oracle.jdbc.OracleDriver", 1521,
    (h, p, d) => s"jdbc:oracle:thin:@//$h:$p/$d", databaseRequired = true)
  val postgres: DbPreset = DbPreset("org.postgresql.Driver", 5432,
    (h, p, d) => s"jdbc:postgresql://$h:$p/$d")

  val presets: Map[String, DbPreset] = Map("mysql" -> mysql,
    "clickhouse" -> clickhouse, "redshift" -> redshift, "oracle" -> oracle,
    "postgres" -> postgres)

  /** Preset connection options from a creds section (reference shape:
    * `host`/`port`/`service`/`user`/`password` — etl_utils.py:506-509).
    */
  def optionsFromCreds(preset: DbPreset, creds: graft.core.Secrets.Creds,
                       section: String): Map[String, String] =
    preset.connOptions(
      graft.core.Secrets.get(creds, section, "host"),
      graft.core.Secrets.get(creds, section, "service"),
      graft.core.Secrets.get(creds, section, "user"),
      graft.core.Secrets.get(creds, section, "password"),
      creds(section).get("port").map(_.toInt).getOrElse(0))

  /** Expand manifest shorthand: a `preset` key plus `host`/`port`/
    * `database` collapses into the concrete `url`+`driver` options; maps
    * without `preset` pass through untouched. Explicit `url`/`driver` in
    * the input win over the preset's.
    */
  def expandPreset(options: Map[String, String]): Map[String, String] =
    options.get("preset") match {
      case None => options
      case Some(p) =>
        val preset = presets.getOrElse(p, sys.error(
          s"unknown jdbc preset '$p' (have: ${presets.keys.mkString(", ")})"))
        // fail here, with names — a missing piece otherwise surfaces later
        // as an opaque driver-level connect error on a malformed URL
        val host = options.getOrElse("host",
          sys.error(s"jdbc preset '$p' needs a 'host' option"))
        val database = options.getOrElse("database",
          if (preset.databaseRequired)
            sys.error(s"jdbc preset '$p' needs a 'database' option")
          else "")
        val port = options.get("port").map(_.toInt).getOrElse(0)
        Map("url" -> preset.url(host, database, port),
          "driver" -> preset.driver) ++
          (options -- Seq("preset", "host", "port", "database"))
    }

  /** ANSI-quoted identifier (Derby/Postgres/Redshift/Oracle): each
    * dot-separated part quoted, embedded quotes doubled. Required — not
    * just hygiene — because Spark's JDBC writer quotes column names at
    * CREATE, so a lower-case column is only reachable from a quoted
    * reference in databases that upper-case unquoted identifiers (Derby,
    * Oracle).
    */
  def quoteIdent(name: String): String =
    name.split('.').map(p => "\"" + p.replace("\"", "\"\"") + "\"").mkString(".")

  /** Single-quoted SQL string literal with embedded quotes doubled. */
  def quoteLit(value: String): String = "'" + value.replace("'", "''") + "'"

  def fullTableOptions(url: String, table: String,
                       extra: Map[String, String] = Map.empty): Map[String, String] =
    Map("url" -> url, "dbtable" -> table,
      "fetchsize" -> defaultFetchSize) ++ extra

  /** Range-pushdown incremental read: the WHERE clause runs in the
    * database, so only one period's rows cross the wire.
    *
    * `table` passes through verbatim — the same contract as Spark's own
    * `dbtable` option (pre-quote it yourself if the name needs quoting).
    * `incField` is quoted by default because Spark's JDBC writer quotes
    * column names at CREATE (a Spark-written lower-case column is ONLY
    * reachable quoted on case-folding databases); for a table created
    * with unquoted DDL outside Spark, quoting would instead demand an
    * exact-case match — pass `quoteField = false` to keep the old
    * case-insensitive resolution there. Period literals are always
    * escaped.
    */
  def incrementalOptions(url: String, table: String, incField: String,
                         period: String, periodNext: String,
                         extra: Map[String, String] = Map.empty,
                         quoteField: Boolean = true): Map[String, String] = {
    val f = if (quoteField) quoteIdent(incField) else {
      require(incField.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"unquoted inc_field must be a plain identifier, got '$incField'")
      incField
    }
    Map("url" -> url,
      "query" ->
        (s"SELECT * FROM $table WHERE $f >= ${quoteLit(period)}" +
          s" AND $f < ${quoteLit(periodNext)}"),
      "fetchsize" -> defaultFetchSize,
      "numPartitions" -> defaultNumPartitions) ++ extra
  }

  /** Parallel partitioned read bounds (for big backfills): Spark splits
    * the scan into numPartitions range queries on partitionColumn.
    */
  def partitionedOptions(url: String, table: String, partitionColumn: String,
                         lowerBound: Long, upperBound: Long, numPartitions: Int,
                         extra: Map[String, String] = Map.empty): Map[String, String] =
    Map("url" -> url, "dbtable" -> table,
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString,
      "fetchsize" -> defaultFetchSize) ++ extra

  def read(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(options).load()

  /** Push a frame to a table; overwrite for full loads, append for
    * incremental (reference redshift_spark.py:7-31 mode logic).
    */
  def write(df: DataFrame, url: String, table: String, incremental: Boolean,
            extra: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .options(Map("url" -> url, "dbtable" -> table) ++ extra)
      .mode(if (incremental) SaveMode.Append else SaveMode.Overwrite)
      .save()

  /** DatasetSpec adapter so manifests can declare `type: jdbc` inputs with
    * read_kwargs carrying the options.
    */
  def fromSpec(spark: SparkSession, ds: DatasetSpec,
               period: Option[(String, String)] = None): DataFrame = {
    val ro = expandPreset(ds.readOptions)
    // The database-side period pushdown needs a plain `dbtable` to wrap;
    // specs built on Spark's `query` option or a partitioned read
    // (`partitionColumn` conflicts with a generated query) fall back to
    // the full read — the engine's Spark-side period filter still
    // restricts rows, just without the wire savings. Note the pushed
    // predicate compares as a string literal: for a TIMESTAMP-typed
    // increment column on a strict database, declare the column as a
    // date/char type or cast via a `query` spec.
    val opts = (ds.incField, period) match {
      case (Some(f), Some((p, pNext)))
          if ro.contains("dbtable") && !ro.contains("partitionColumn") =>
        // manifests opt out of identifier quoting (legacy unquoted-DDL
        // tables) via read_kwargs: {quote_inc_field: "false"}
        incrementalOptions(ro("url"), ro("dbtable"),
          f, p, pNext,
          ro -- Seq("url", "dbtable", "quote_inc_field"),
          quoteField = ro.get("quote_inc_field").forall(_.toBoolean))
      case _ => ro
    }
    read(spark, opts)
  }
}
