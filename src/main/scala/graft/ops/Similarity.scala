package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the probe set is assumed small relative to the corpus and
  * is broadcast, so the corpus is scanned exactly once with no shuffle of
  * the big side; top-k is a per-probe window over the scored pairs. The IVF
  * variant prunes the scan to the probe's cluster(s), turning a full scan
  * into a partition-pruned one — at 100 TB the corpus would be written
  * partitioned by cluster id so pruning happens at the file level.
  */
object Similarity {

  /** Exact brute-force cosine top-k: every probe row scored against every
    * corpus row; corpus never shuffles (probes broadcast).
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("p_emb"), col("c_emb")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** IVF-style top-k: only candidates in the same cluster as the probe are
    * scored. `clusterCol` is a precomputed assignment (here the corpus'
    * `label`; in production, a k-means cell id the table is partitioned by).
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, clusterCol: String, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("p_emb"), col(clusterCol).as("p_cluster"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("c_emb"), col(clusterCol).as("c_cluster"))
    val scored = c.join(broadcast(p),
        col("p_cluster") === col("c_cluster") && col("probe_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("p_emb"), col("c_emb")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Cosine near-duplicate pairs above `threshold` within a probe subset
    * (`probeFilter` keeps the left side small; at scale the left side is
    * the newly-ingested delta, not a modulo sample).
    */
  def cosineNearDupPairs(corpus: DataFrame, probeModulo: Int, threshold: Double): DataFrame = {
    val a = corpus.filter(col("vec_id") % probeModulo === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    b.join(broadcast(a), col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("a_emb"), col("b_emb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
  }
}
