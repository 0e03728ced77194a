package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Host-graph PageRank: exact integer semantics pinned against a
  * driver-side reference implementation, structural sanity on a star
  * graph, and bit-determinism under repartitioning.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's contract, restated in driver-side Scala longs —
    * truncating division at exactly the same three points.
    */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
                          ppm: Long = 850000L): Map[String, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = verts.size
    val init = Graph.Scale / n
    val base = ((1000000L - ppm) * init) / 1000000L
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = verts.map(_ -> init).toMap
    for (_ <- 1 to iters)
      r = verts.map { v =>
        v -> (base + edges.filter(_._2 == v)
          .map(e => r(e._1) * ppm / 1000000L / outdeg(e._1)).sum)
      }.toMap
    r
  }

  test("star graph: the hub out-ranks every leaf; totals stay under Scale") {
    val edges = (1 to 9).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val out = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .orderBy(desc("rank_micro"), col("id"))
      .as[(String, Long)].collect()
    assert(out.head._1 == "hub")
    assert(out.head._2 > out(1)._2 * 5, "hub must dominate leaves")
    assert(out.map(_._2).sum <= Graph.Scale,
      "truncation must never create mass")
    // leaves are symmetric — identical ranks
    assert(out.tail.map(_._2).distinct.size == 1)
  }

  test("distributed ranks are bit-identical to the driver-side reference") {
    val es = Seq(
      "a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "d" -> "c",
      "d" -> "a", "e" -> "d", "b" -> "e", "c" -> "e")
    val expected = refPageRank(es, iters = 7)
    val got = Graph.pageRank(es.toDF("src", "dst"), "src", "dst",
        iterations = 7, checkpointEvery = 3)
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("dangling destination participates and its mass evaporates") {
    // "sink" has no out-edges: it accrues rank but re-emits nothing
    val es = Seq("a" -> "sink", "b" -> "sink", "a" -> "b")
    val expected = refPageRank(es, iters = 4)
    val got = Graph.pageRank(es.toDF("src", "dst"), "src", "dst",
        iterations = 4).as[(String, Long)].collect().toMap
    assert(got == expected)
    assert(got("sink") > got("b"))
  }

  test("results are identical under different input partitioning") {
    val es = (0 until 60).map(i => (s"h${i % 10}", s"h${(i * 7 + 3) % 10}"))
      .distinct.filter(e => e._1 != e._2)
    val df = es.toDF("src", "dst")
    val one = Graph.pageRank(df.repartition(1), "src", "dst", iterations = 5)
      .as[(String, Long)].collect().toMap
    val many = Graph.pageRank(df.repartition(13), "src", "dst", iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(one == many)
    assert(one == refPageRank(es, iters = 5))
  }
}
