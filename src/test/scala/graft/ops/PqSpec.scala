package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: codebook shape, encode-vs-reference argmin, ADC
  * distance fidelity, and the recall repair of the exact re-rank stage.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16; private val m = 4; private val k = 8
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    // a smooth 1-D manifold in R^16: neighbor distances grow with index
    // gap, so near-neighbor structure is COARSER than quantization error
    // (PQ cannot rank pure-noise neighbors, by design)
    Seq.tabulate(80) { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (5.0 * math.sin(2 * math.Pi * (i / 40.0 + j / 16.0))).toFloat +
          rnd.nextGaussian().toFloat * 0.05f).toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("trainPqCodebooks: full m x k codebook with subDim centroids; seeded-deterministic") {
    val cb = Pq.trainPqCodebooks(corpus, "embedding", m, k, seed = 11L)
    val rows = cb.select("sub", "code").as[(Int, Int)].collect()
    assert(rows.length == m * k)
    assert(rows.toSet == (for (s <- 0 until m; c <- 0 until k) yield (s, c)).toSet)
    assert(cb.select(size(col("centroid"))).as[Int].collect().forall(_ == dim / m))
    val again = Pq.trainPqCodebooks(corpus, "embedding", m, k, seed = 11L)
    assert(cb.collect().map(_.toString).sorted
      .sameElements(again.collect().map(_.toString).sorted))
  }

  test("encodePq matches the driver-side per-subspace argmin") {
    val cb = Pq.codebookArrays(Pq.trainPqCodebooks(corpus, "embedding", m, k, seed = 11L))
    val enc = Pq.encodePq(corpus, "embedding", cb)
      .select("vec_id", "embedding", "codes")
      .as[(Long, Seq[Float], Seq[Int])].collect()
    for ((_, emb, codes) <- enc; s <- 0 until m) {
      val slice = emb.slice(s * (dim / m), (s + 1) * (dim / m)).map(_.toDouble)
      val dists = cb(s).map(c =>
        slice.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      val ref = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(codes(s) == ref, s"sub $s: code ${codes(s)} vs argmin $ref")
    }
  }

  test("fused ADC (native dist tables) is bit-identical to the relational ADC join") {
    val codebook = Pq.trainPqCodebooks(corpus, "embedding", m, k, seed = 11L)
    val cb = Pq.codebookArrays(codebook)
    val (clustered, model) = Similarity.kmeansCells(corpus, cells = 4, seed = 11L)
    val candCodes = Pq.encodePq(clustered, "embedding", cb)
      .select(col("vec_id").as("cand_id"), col("cell"), col("codes"))
    val probes = Similarity.assignCells(corpus.filter(col("vec_id") % 10 === 0), model)
      .select(col("vec_id").as("probe_id"), col("cell"), col("embedding"))
    val joinPath = Pq.adcTopK(candCodes, probes, codebook, topk = 7)
      .select("probe_id", "cand_id", "adc_micro", "rank")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val fused = Pq.adcTopKFused(candCodes, probes, cb, topk = 7)
      .select("probe_id", "cand_id", "adc_micro", "rank")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(joinPath.nonEmpty && joinPath == fused)
  }

  test("ADC top-k tracks exact L2 neighbors; exact re-rank recovers cosine order") {
    val probes = corpus.filter(col("vec_id") % 10 === 0)
    val all = corpus.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().map { case (id, e) =>
        id -> e.map(_.toDouble).toArray }.toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // exact L2 top-5 — ADC approximates L2 distance, so L2 (not cosine)
    // is the right reference metric
    val probeIds = all.keys.filter(_ % 10 == 0)
    val exactL2 = probeIds.map { p =>
      p -> all.keys.filter(_ != p).toSeq
        .sortBy(c => (l2(all(p), all(c)), c)).take(5).toSet
    }.toMap

    // cells = 1: no IVF pruning, isolating pure ADC quantization error
    val approx = Pq.pqIvfTopK(corpus, probes, topk = 5, m = m, k = k,
        cells = 1, seed = 11L)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exactL2.map { case (p, s) =>
      approx.getOrElse(p, Set.empty).intersect(s).size.toDouble / s.size }
    assert(recall.sum / recall.size > 0.5,
      s"ADC recall vs exact L2 ${recall.sum / recall.size} too low")

    // two-stage: ADC shortlist of 20, exact cosine re-rank to 5 — held to
    // the exact cosine brute force
    val exactCos = Similarity.bruteForceTopK(corpus, probes, k = 5)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val reranked = Pq.pqIvfTopK(corpus, probes, topk = 5, m = m, k = k,
        cells = 1, seed = 11L, rerank = 20)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall2 = exactCos.map { case (p, s) =>
      reranked.getOrElse(p, Set.empty).intersect(s).size.toDouble / s.size }
    assert(recall2.sum / recall2.size > 0.7,
      s"re-ranked cosine recall ${recall2.sum / recall2.size} too low")
  }

  test("persisted PQ index: indexed search == stored-artifact recompute, " +
      "append encodes with the STORED model, scans prune to probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
    Pq.writePqIndex(corpus, dir, m = 4, k = 16, cells = 8, seed = 42L)
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val out1 = Pq.pqTopKIndexed(spark, dir, probes, topk = 3)
    assert(out1.count() > 0)
    // candidate universe before the append excludes delta ids
    assert(out1.filter(col("cand_id") % 3 === 0).isEmpty)
    // plan prunes the cell-partitioned codes scan to the probed cells
    val plan = out1.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("dynamicpruning") || plan.contains("isnotnull(cell")),
      s"codes scan not partition-pruned:\n$plan")
    Pq.appendPqIndex(spark, dir, delta)
    // appended codes are EXACTLY the stored-model encode of the delta
    val cb = Pq.codebookArrays(spark.read.parquet(s"$dir/codebook"))
    val expected = Pq.encodePq(delta, "embedding", cb)
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val stored = spark.read.parquet(s"$dir/codes")
      .filter(col("cand_id") % 3 === 0)
      .select(col("cand_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stored === expected)
    // and the grown index now serves delta candidates
    val out2 = Pq.pqTopKIndexed(spark, dir, probes, topk = 3)
    assert(out2.filter(col("cand_id") % 3 === 0).count() > 0)
  }

  test("streaming PQ ingest batches equal one batch append; a replayed " +
      "batch leaves codes and increment unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqstr").toString
    val ing = java.nio.file.Files.createTempDirectory("graft_pqing").toString
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    Pq.writePqIndex(emb.filter(col("vec_id") % 3 =!= 0), dir,
      m = 4, k = 16, cells = 8, seed = 42L)
    graft.streaming.Streams.applyPqIngestBatch(
      emb.filter(col("vec_id") % 6 === 0).toDF(), dir, ing, 0L)
    graft.streaming.Streams.applyPqIngestBatch(
      emb.filter(col("vec_id") % 6 === 3).toDF(), dir, ing, 1L)
    // streamed codes are exactly the stored-model encode of the delta
    val cb = Pq.codebookArrays(spark.read.parquet(s"$dir/codebook"))
    val expected = Pq.encodePq(emb.filter(col("vec_id") % 3 === 0),
        "embedding", cb)
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val stored = spark.read.parquet(s"$dir/codes")
      .filter(col("cand_id") % 3 === 0)
      .select(col("cand_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stored === expected)
    // replay of batch 1: anti-join no-op + delete-first increment rewrite
    val before = spark.read.parquet(s"$dir/codes").count()
    graft.streaming.Streams.applyPqIngestBatch(
      emb.filter(col("vec_id") % 6 === 3).toDF(), dir, ing, 1L)
    assert(spark.read.parquet(s"$dir/codes").count() === before,
      "replayed batch must not duplicate codes")
    assert(spark.read.parquet(s"$ing/batch1").count() ===
      emb.filter(col("vec_id") % 6 === 3).count())
  }

  test("PQ GDPR lane: vacuum hides forgotten vectors (files byte-" +
      "identical), compact scrubs only affected cell files, append " +
      "replay is idempotent and tombstoned ids are rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqvac").toString
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") % 3 =!= 0)
    Pq.writePqIndex(corpus, dir, m = 4, k = 16, cells = 8, seed = 42L)
    val probes = emb.filter(col("vec_id") % 50 === 0)
    def stamps(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(s"$dir/codes"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val forget = corpus.filter(col("vec_id") % 5 === 0).select("vec_id")
    val nForget = forget.count()
    val before = stamps()
    val removed = Pq.vacuumPqIndex(spark, dir, forget)
    assert(removed === nForget)
    assert(stamps() == before, "codes files rewritten by a tombstone vacuum")
    // hidden reads == the same stored model scored over the surviving
    // codes (vacuum must change membership, never geometry)
    val cb = Pq.codebookArrays(spark.read.parquet(s"$dir/codebook"))
    val hidden = Pq.pqTopKIndexed(spark, dir, probes, topk = 3)
      .collect().map(_.toSeq).toSet
    assert(hidden.nonEmpty)
    val storedCodes = spark.read.parquet(s"$dir/codes")
      .filter(!(col("cand_id") % 3 =!= 0 && col("cand_id") % 5 === 0))
      .select("cand_id", "cell", "codes")
    // replicate pqTopKIndexed's probe assignment against the stored
    // centroids, then score the filtered codes directly
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .sortBy(_.getAs[Int]("cell"))
      .map(_.getAs[Seq[Double]]("centroid").toArray)
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = probes.withColumn("cell", explode(
        graft.functions.NativeFunctions.nearestCells(col("embedding"), bc, 1)))
      .select(col("vec_id").as("probe_id"), col("cell"), col("embedding"))
    val expected = Pq.adcTopKFused(storedCodes, assigned, cb, topk = 3)
      .select("probe_id", "cand_id", "adc_micro", "rank")
      .collect().map(_.toSeq).toSet
    assert(hidden === expected)
    // double-vacuum does not double-count
    assert(Pq.vacuumPqIndex(spark, dir, forget) === 0L)
    // a tombstoned id cannot re-enter via append until compact
    val resub = emb.filter(col("vec_id").isin(
      forget.limit(1).collect().map(_.getLong(0)).toIndexedSeq: _*))
    val e = intercept[IllegalArgumentException](
      Pq.appendPqIndex(spark, dir, resub))
    assert(e.getMessage.contains("tombstoned"))
    // compact: targeted physical scrub; same answers; tombstones gone
    assert(Pq.compactPqIndex(spark, dir) === removed)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("cand_id") % 3 =!= 0 && col("cand_id") % 5 === 0).isEmpty)
    assert(Pq.pqTopKIndexed(spark, dir, probes, topk = 3)
      .collect().map(_.toSeq).toSet === hidden)
    // append replay is idempotent: same delta twice -> no duplicate ids
    val delta = emb.filter(col("vec_id") % 3 === 0)
    Pq.appendPqIndex(spark, dir, delta)
    Pq.appendPqIndex(spark, dir, delta)
    val ids = spark.read.parquet(s"$dir/codes").select("cand_id")
    assert(ids.count() === ids.distinct().count())
  }
}
