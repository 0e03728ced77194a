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

  /** Equi-join on `keys` with the LEFT (big) side salted and the RIGHT
    * (small) side replicated `factor`×. Result columns = left ++ right
    * (join keys once, from the left); result SET is exactly the plain
    * join's — only the shuffle distribution changes, the one relief for
    * a single indivisible hot key that AQE's range-split cannot divide.
    * Join types: `inner` and `left` (the shapes where the right side is
    * the lookup; the replicated side must not drive an outer edge).
    *
    * The salt hashes the WHOLE left row, so rows identical in every
    * column share a salt and still land on one reducer — run exact dedup
    * first (the pipeline's own first step) or project in a
    * distinguishing column before salting a frame of duplicates.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    require(!(left.columns ++ right.columns).contains("_salt"),
      "input already carries a _salt column")
    // Deterministic salt: hash of all left columns mod factor — stable
    // across retries (rand() would break task retry idempotency).
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    val cond: Column = (keys.map(k => salted(k) === replicated(k)) :+
      (salted("_salt") === replicated("_salt"))).reduce(_ && _)
    val joined = salted.join(replicated, cond, joinType)
      .drop(salted("_salt")).drop(replicated("_salt"))
    keys.foldLeft(joined)((df, k) => df.drop(replicated(k)))
  }
}
