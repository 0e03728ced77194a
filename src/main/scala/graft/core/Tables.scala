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
    * `events.ts` has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * parquet across testdata generations, so branch on the loaded schema:
    *
    *  - LongType: the nanos file read via legacy.parquet.nanosAsLong
    *    (set in [[GraftSession.tune]]). Convert with integer division to
    *    microseconds — the same truncation DuckDB applies to TIMESTAMP(NANOS),
    *    so both engines see identical values. `ts DIV 1000` (integer div) is
    *    essential: float division of ~1.7e18 ns loses precision past the
    *    53-bit double mantissa.
    *  - TimestampNTZ: a MICROS file with isAdjustedToUTC=false. Cast to
    *    session-local timestamp; value-preserving because tune() pins the
    *    session timezone to UTC, and identical to DuckDB's read of the
    *    same file.
    *  - Timestamp: a MICROS file already adjusted to UTC — use as-is.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      GraftSession.tune(spark)
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ =>
          raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every corpus table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
