package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE learning and encoding vs an independent driver-side reference
  * implementation, plus the greedy-scan semantics of the native
  * expression.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // --- plain-Scala reference (no Spark) ------------------------------
  private def scanMerge(syms: Vector[String], lhs: String, rhs: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
        out += (lhs + rhs); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(words: Map[String, Long], numMerges: Int,
                       minPair: Long): Seq[(String, String)] = {
    var table = words.toSeq.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toVector, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- table; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      val ranked = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }
      if (ranked.isEmpty || ranked.head._2 < minPair) done = true
      else {
        val (l, r) = ranked.head._1
        merges += ((l, r))
        table = table.map { case (s, f) => (scanMerge(s, l, r), f) }
      }
    }
    merges.toSeq
  }

  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.split("").filter(_.nonEmpty).toVector) {
      case (syms, (l, r)) => scanMerge(syms, l, r) }

  private val corpus = Seq(
    (1L, "low lower lowest low low"),
    (2L, "newer newest new new newer"),
    (3L, "wider wide widest lower low"),
    (4L, "the newest and the widest and the lowest"))

  test("learned merge table matches the reference bit for bit") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Bpe.learn(docs, "text", numMerges = 12)
      .collect().sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val want = refLearn(words, numMerges = 12, minPair = 2L)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty && got.length <= 12)
  }

  test("encoding matches the reference on every document") {
    val docs = corpus.toDF("doc_id", "text")
    val mergeTable = Bpe.learn(docs, "text", numMerges = 10)
    val merges = Bpe.mergesOf(mergeTable)
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .select("doc_id", "pieces_csv", "n_tokens", "n_pieces")
      .collect()
    val mseq = merges.map(a => (a(0), a(1))).toSeq
    corpus.zip(got).foreach { case ((id, text), row) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val pieces = toks.flatMap(w => refEncode(w, mseq))
      assert(row.getLong(0) == id)
      assert(row.getString(1) == pieces.mkString(","),
        s"doc $id: ${row.getString(1)} vs ${pieces.mkString(",")}")
      assert(row.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(row.getAs[Long]("n_pieces") == pieces.length.toLong)
    }
  }

  test("native merge scan is greedy left-to-right non-overlapping") {
    val bc = spark.sparkContext.broadcast(Array(Array("a", "a")))
    val got = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("a", "a", "a", "a")),
        Tuple1(Seq("b", "a", "a")))
      .toDF("syms")
      .select(graft.functions.BpeFunctions.bpeApply(col("syms"), bc).as("out"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq("b", "aa")))
  }

  test("batched learning matches sequential and applies >1 merge per round") {
    // a mix of symbol-disjoint frequent words (batchable) and the
    // overlap-heavy originals (forces the prefix/disjoint/dominant guards)
    val corpus2 = corpus ++ Seq(
      (5L, Seq.fill(9)("ab").mkString(" ")),
      (6L, Seq.fill(8)("cd").mkString(" ")),
      (7L, Seq.fill(7)("ef").mkString(" ")),
      (8L, Seq.fill(6)("gh").mkString(" ")),
      (9L, Seq.fill(5)("ij").mkString(" ")))
    val docs = corpus2.toDF("doc_id", "text")
    val (table, rounds) = Bpe.learnWithRounds(docs, "text", numMerges = 16)
    val got = table.collect().sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    val words = corpus2.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val want = refLearn(words, numMerges = 16, minPair = 2L)
    assert(got == want, s"got $got\nwant $want")
    assert(rounds < got.length,
      s"batching never compressed: $rounds rounds for ${got.length} merges")
  }

  test("local fast path and distributed rounds learn the identical table") {
    val corpus2 = corpus ++ Seq(
      (5L, Seq.fill(9)("ab").mkString(" ")),
      (6L, Seq.fill(8)("cd").mkString(" ")),
      (7L, Seq.fill(7)("ef").mkString(" ")))
    val docs = corpus2.toDF("doc_id", "text")
    val (localT, localRounds) = Bpe.learnWithRounds(docs, "text", 16)
    val key = "spark.graft.bpe.localVocabLimit"
    spark.conf.set(key, "0") // force the distributed star rounds
    try {
      val (distT, distRounds) = Bpe.learnWithRounds(docs, "text", 16)
      val l = localT.collect().map(r => (r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).sortBy(_._1).toSeq
      val d = distT.collect().map(r => (r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).sortBy(_._1).toSeq
      assert(l == d, s"local $l\ndistributed $d")
      assert(localRounds == distRounds,
        s"round counts diverge: local $localRounds vs dist $distRounds")
    } finally spark.conf.unset(key)
  }

  test("selectBatch enforces prefix, disjoint, and dominant guards") {
    // disjoint + dominant: all three batch together
    assert(Bpe.selectBatch(
      Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L)),
      2L, Map.empty, Map.empty).map(_._1) == Seq("a", "c", "e"))
    // shared symbol stops the batch at the overlap (prefix rule: nothing after)
    assert(Bpe.selectBatch(
      Seq(("a", "b", 10L), ("b", "c", 9L), ("e", "f", 8L)),
      2L, Map.empty, Map.empty).map(_._1) == Seq("a"))
    // created-symbol collision ("ab") stops the batch
    assert(Bpe.selectBatch(
      Seq(("a", "b", 10L), ("ab", "c", 9L)),
      2L, Map.empty, Map.empty).map(_._1) == Seq("a"))
    // dominant: a created pair bound of 9 blocks a count-9 candidate (tie
    // could lex-win), but not a count-10 one
    assert(Bpe.selectBatch(
      Seq(("a", "b", 10L), ("c", "d", 9L)),
      2L, Map("a" -> 9L), Map.empty).map(_._1) == Seq("a"))
    assert(Bpe.selectBatch(
      Seq(("a", "b", 10L), ("c", "d", 10L)),
      2L, Map("a" -> 9L), Map.empty).map(_._1) == Seq("a", "c"))
    // minPairCount truncates
    assert(Bpe.selectBatch(
      Seq(("a", "b", 10L), ("c", "d", 1L)),
      2L, Map.empty, Map.empty).map(_._1) == Seq("a"))
  }

  test("early stop: no pair at minPairCount ends learning") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every pair count is 1 < minPairCount=2 -> zero merges
    assert(Bpe.learn(docs, "text", numMerges = 5).count() == 0L)
  }
}
