package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins: when one join key dominates (a hot user,
  * an empty-string shingle), a plain shuffle puts the whole key on one
  * task. Salting splits the skewed side's rows across `factor` sub-keys
  * and replicates the other side once per salt — turning one straggler
  * task into `factor` even ones.
  *
  * AQE's skew-join handling (on by default in GraftSession) covers most
  * cases at runtime; explicit salting is for the planned-ahead case where
  * the skew is known and the other side is too big to broadcast but cheap
  * to replicate `factor`×.
  */
object Skew {

  /** Inner equi-join on `keys` with the LEFT side salted and the RIGHT
    * side replicated `factor`×. Result columns = left ++ right (join keys
    * once, from the left).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    // Deterministic salt: hash of all left columns mod factor — stable
    // across retries (rand() would break task retry idempotency).
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    val cond: Column = (keys.map(k => salted(k) === replicated(k)) :+
      (salted("_salt") === replicated("_salt"))).reduce(_ && _)
    val joined = salted.join(replicated, cond)
      .drop(salted("_salt")).drop(replicated("_salt"))
    keys.foldLeft(joined)((df, k) => df.drop(replicated(k)))
  }
}
