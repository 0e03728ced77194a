package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish corpus (see TESTDATA.md) and
  * temp-view registration.
  *
  * View registration is the engine's whole "catalog", mirroring the
  * reference's per-session temp views (`sql_register`,
  * reference yaetos/etl_utils.py:349-354): ephemeral, per-session,
  * view name = dataset name.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from `dir` (a `/root/testdata/sf*` directory).
    *
    * `events.ts` is nanosecond-precision in parquet, which Spark cannot
    * read natively. We read it as a raw long (legacy.parquet.nanosAsLong)
    * and convert with integer division to microseconds — the same
    * truncation DuckDB applies when it reads TIMESTAMP(NANOS), so both
    * engines see identical values. `ts DIV 1000` (integer div) is
    * essential: float division of ~1.7e18 ns loses precision past the
    * 53-bit double mantissa.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      GraftSession.tune(spark)
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every corpus table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
