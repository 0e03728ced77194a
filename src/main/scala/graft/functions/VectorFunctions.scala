package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>` columns.
  *
  * All folds run left-to-right in array order (`aggregate` over `zip_with`),
  * so results are bit-reproducible and independent of partitioning — unlike
  * a shuffle-order-dependent `sum`. Everything here is built from codegen'd
  * higher-order functions; no UDFs, so whole-stage codegen stays intact and
  * the expressions survive on a 1000-executor cluster unchanged.
  */
object VectorFunctions {

  /** Elementwise product then ordered sum: dot(a, b). Operands are cast to
    * double before multiplying so float inputs don't accumulate in float.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL-safe only insofar as inputs are; zero-norm
    * vectors yield NULL (division by zero → null in Spark SQL semantics is
    * actually Infinity/NaN for doubles, so guard explicitly).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(null)).otherwise(d / nn)
  }

  /** Squared L2 distance, ordered fold. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dlt = x.cast("double") - y.cast("double")
        dlt * dlt
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
