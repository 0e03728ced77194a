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
}
