package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed cardinality sketches with DETERMINISTIC, engine-portable
  * results.
  *
  * `approx_count_distinct` (HLL++) answers the same question, but its
  * estimate depends on Spark's internal hash and merge order — two
  * engines (or two Spark versions) can disagree, which breaks the
  * dual-engine verification contract this library holds every operator
  * to. KMV (k-minimum-values, Bar-Yossef et al. 2002) with a portable
  * md5-derived hash gives an estimate that is a pure function of the
  * value set: same rows in, same estimate out, on any engine.
  */
object Sketches {

  /** Uniform 60-bit hash of a value — md5 hex prefix, the same
    * construction as [[Sampling.hashBucket]] (bit-identical in DuckDB via
    * `CAST('0x' || substr(md5(v), 1, 15) AS BIGINT)`).
    */
  def hash60(v: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), v.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** KMV distinct-count estimate per group: keep the `k` smallest
    * distinct hashes of `valueCol`; if a group has fewer than `k`
    * distinct values the count is EXACT, else the k-th smallest hash
    * h_(k) estimates the cardinality as `(k-1) · 2^60 / h_(k)` (the
    * k-th order statistic of uniform draws; relative error ~ 1/√(k-2)).
    *
    * Returns `(group..., n_kept, kth_hash, est_distinct)` where
    * `est_distinct` is rounded to 2 decimals.
    *
    * 100 TB shape: the distinct on (group, hash) aggregates with
    * map-side combine (the corpus-sized shuffle); the min-k selection
    * then runs in TWO window stages — first within (group, hash mod 64)
    * sub-buckets, which caps any single task's sort at the group's
    * distinct count / 64 and yields ≤ 64·k survivors per group, then the
    * final min-k over those survivors. A hot group (one key holding most
    * of the corpus) therefore never sorts its full distinct set on one
    * task — the classic window-skew trap the first stage exists to break.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 64, salt: String = ""): DataFrame = {
    require(k >= 3, s"k must be >= 3 for a usable estimate, got $k")
    val g = groupCols.map(col)
    val hashed = df
      .select((g :+ hash60(col(valueCol), salt).as("_h")): _*)
      .distinct()
    val pre = Window.partitionBy((g :+ pmod(col("_h"), lit(64L))): _*)
      .orderBy(col("_h"))
    val fin = Window.partitionBy(g: _*).orderBy(col("_h"))
    val minK = hashed
      .withColumn("_rn0", row_number().over(pre)).filter(col("_rn0") <= k)
      .withColumn("_rn", row_number().over(fin)).filter(col("_rn") <= k)
    val m = math.pow(2.0, 60)
    minK.groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("_h")).as("kth_hash"))
      .withColumn("est_distinct",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * m) / col("kth_hash")), 2))
  }
}
