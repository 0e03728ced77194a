package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data-quality checks (reference yaetos/spark_utils.py:16-40): primary-key
  * uniqueness and the non-unique-PK finder. Distributed — the uniqueness
  * test is two aggregates, the finder is one window, no collects.
  */
object Checks {

  /** True iff `pks` uniquely identify rows. */
  def pkIsUnique(df: DataFrame, pks: Seq[String]): Boolean = {
    val pkCols = pks.map(col)
    val counts = df.agg(
      count(lit(1)).as("n"),
      countDistinct(pkCols.head, pkCols.tail: _*).as("d")).head()
    counts.getLong(0) == counts.getLong(1)
  }

  /** Rows whose `pks` value occurs more than once, with the occurrence
    * count attached (reference's `find_non_unique_pks`).
    */
  def nonUniquePks(df: DataFrame, pks: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*)
    df.withColumn("_count_pk", count(lit(1)).over(w))
      .filter(col("_count_pk") >= 2)
  }

  /** Count of null values per column — cheap profile used before loads. */
  def nullProfile(df: DataFrame): DataFrame = {
    val aggs = df.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Column-level PII scan: for every string column, the row-hit count
    * and rate of each PII pattern — the governance inventory that tells
    * you WHERE the emails/phones/IPs live before [[TextAnalysis
    * .redactPii]] scrubs them or [[graft.core.io.Maintenance
    * .deleteMatching]] forgets them.
    *
    * One scan, one single-row aggregate (columns × patterns counters,
    * map-side combined), then a row-local `stack` unpivot — no shuffle of
    * the data itself at any width, which is what lets it run over a
    * 100 TB table as a by-product of any other full read.
    *
    * Output: `(column_name, kind, n_hits, n_rows, hit_rate)`, one row per
    * string column × pattern.
    */
  def piiProfile(df: DataFrame,
                 patterns: Seq[(String, String)] = TextAnalysis.piiPatterns)
      : DataFrame = {
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    require(strCols.nonEmpty, "piiProfile: no string columns to scan")
    val aggs = strCols.flatMap(c => patterns.map { case (k, re) =>
      sum(when(col(c).rlike(re), 1L).otherwise(0L)).as(s"${c}__$k") })
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val cells = strCols.flatMap(c =>
      patterns.map { case (k, _) => s"'$c', '$k', `${c}__$k`" })
    one.select(
        expr(s"stack(${cells.size}, ${cells.mkString(", ")}) " +
          "AS (column_name, kind, n_hits)"),
        col("n_rows"))
      .withColumn("hit_rate", round(col("n_hits") / col("n_rows"), 6))
      .select("column_name", "kind", "n_hits", "n_rows", "hit_rate")
  }
}
