package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) `private[sql]`, and
  * the function registry can only build expressions whose constructor
  * args are all Expressions — so a custom expression carrying a
  * non-Expression payload (e.g. [[graft.functions.LshBuckets]]'s
  * broadcast planes) needs this one-hop bridge to become a Column.
  * Deliberately the ONLY file outside the `graft` namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Whether the column is a sort expression (`col.desc` / `.asc_nulls_…`)
    * rather than a value — sort nodes can't nest inside value expressions
    * (struct, min_by), so callers pick a sort-based plan instead.
    */
  def isSortOrder(c: Column): Boolean =
    c.node.isInstanceOf[org.apache.spark.sql.internal.SortOrder]

  /** Where the catalog would place managed table `table` — used by
    * `Writer.writeBucketed` to clear an orphaned location (left by an
    * earlier session whose in-memory catalog died with it) before an
    * Overwrite `saveAsTable`, which otherwise fails
    * LOCATION_ALREADY_EXISTS. `sessionState` is `private[sql]` in
    * Spark 4, hence the bridge hop.
    */
  def defaultTablePath(spark: SparkSession, table: String): java.net.URI = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    s.sessionState.catalog.defaultTablePath(
      s.sessionState.sqlParser.parseTableIdentifier(table))
  }
}
