package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analysis for crawl corpora: host-level PageRank, the
  * standard quality prior for web training data (Common Crawl publishes
  * host ranks; CCNet/RefinedWeb-style pipelines weight or gate documents
  * by them). Reference scope: yaetos ships no graph operator — this is
  * part of the beyond-reference LLM-pipeline surface, like `Dedup` and
  * `Similarity`.
  *
  * All rank arithmetic is EXACT integer micro-units (1e12 total mass,
  * damping in parts-per-million), so results are bit-identical under any
  * partitioning or aggregation order — the same order-free-sum contract
  * as `Dsir` — and a SQL engine can replay the iterations verbatim for
  * the oracle gate.
  */
object Graph {

  /** Total rank mass in micro-units: ranks are longs out of 1e12. */
  val Scale: Long = 1000000000000L

  /** PageRank over a directed edge list, `iterations` synchronous
    * rounds, returning `(id, rank_micro)` — rank in micro-units of
    * [[Scale]], descending rank = more-linked host.
    *
    * Semantics (deterministic, integer-exact):
    *   - vertex set = distinct sources ∪ destinations; parallel edges
    *     must be pre-collapsed and self-loops pre-filtered if undesired
    *     (they are honored as given);
    *   - init: `Scale div N` per vertex;
    *   - per round: each vertex keeps `base = ((1e6 - dampingPpm) *
    *     (Scale div N)) div 1e6` and receives `((r_src * dampingPpm)
    *     div 1e6) div outdeg(src)` along each in-edge — every division
    *     truncates, so dangling-vertex mass and division remainders
    *     evaporate (ranks sum to slightly under [[Scale]]; this is a
    *     quality SIGNAL, not a probability distribution).
    *
    * 100 TB shape: the loop is O(iterations) joins of a static
    * `(src, dst, outdeg)` edge table against the current rank table —
    * edges are the big side and are shuffled ONCE onto the src key here
    * (AQE reuses that layout each round via exchange reuse when possible;
    * on a real cluster, bucket the edge table by src to pin it); ranks
    * (one row per HOST, not per document) ride the small side of each
    * join. Lineage is truncated through `core.Checkpoints` every
    * `checkpointEvery` rounds — reliable checkpoints when a dir is set,
    * superseded files deleted (the `connectedComponents` pattern).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, dampingPpm: Long = 850000L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be in [0, 1e6], got $dampingPpm")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val sc = edges.sparkSession.sparkContext
    import graft.core.Checkpoints.{truncate, pathOf, delete}

    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val verts = e0.select(col("src").as("id"))
      .unionByName(e0.select(col("dst").as("id"))).distinct()
    val outdeg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // static per-round left side, materialized once; joining ranks by src
    // each round reuses this layout
    val linked = truncate(e0.join(outdeg, "src"))
    var linkedCp = pathOf(linked)

    // driver-side count: one row per distinct host — at web scale ~1e8
    // rows, a cheap count over an aggregated table, never per-document
    val n = verts.count()
    require(n > 0, "pageRank on an empty edge list")
    val init = Scale / n
    val base = ((1000000L - dampingPpm) * init) / 1000000L

    var ranks = truncate(verts.select(col("id"), lit(init).as("rank_micro")))
    var prevCp = pathOf(ranks)
    var it = 0
    while (it < iterations) {
      val contrib = linked
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          divTrunc(divTrunc(col("rank_micro") * dampingPpm, 1000000L),
            col("outdeg")).as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      val next = verts
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank_micro"))
      it += 1
      if (it % checkpointEvery == 0 || it == iterations) {
        val cp = truncate(next)
        delete(sc, prevCp)
        prevCp = pathOf(cp)
        ranks = cp
      } else ranks = next
    }
    // the edge-side checkpoint is superseded once the final ranks are
    // materialized (ranks project off their own files, not linked's)
    delete(sc, linkedCp)
    linkedCp = None
    ranks
  }

  /** Exact truncating long division as a Column — Spark's `/` on longs
    * promotes to double, which loses exactness past 2^53 (rank * ppm
    * reaches ~8.5e17); SQL's `div` (IntegralDivide) keeps the arithmetic
    * in integers end-to-end.
    */
  private def divTrunc(a: Column, b: Column): Column =
    call_function("div", a, b)
  private def divTrunc(a: Column, b: Long): Column =
    call_function("div", a, lit(b))
}
