package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BpeFunctions.bpeApply
import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding subword vocabulary induction and encoding — the
  * subword complement of [[TextAnalysis.buildVocab]]'s word-level path
  * (real training pipelines tokenize subword; reference: Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * DETERMINISTIC by construction: merges are chosen by
  * `(pair count DESC, lhs ASC, rhs ASC)` — a pure function of the
  * corpus, so two runs (or two engines) learn the identical merge table;
  * application is the greedy left-to-right non-overlapping scan
  * ([[graft.functions.BpeRuntime]]), one pass per merge rank.
  *
  * ITERATION COST: pair counts aggregate over the DISTINCT-WORD table,
  * never the corpus (the classic word-frequency-table optimization, so
  * round cost scales with vocabulary, not corpus size), and each round
  * applies a BATCH of merges, not one: from the round's ranked pair
  * table, the maximal sorted prefix that is provably order-equivalent
  * to sequential BPE is applied in a single pass (see
  * [[Bpe.selectBatch]] for the exactness conditions). Measured ~1.7x
  * fewer rounds than merges on the dense sf0.001 text corpus, and the
  * rate improves as the pair-count distribution flattens — exactly the
  * long-tail regime a production 32k-merge run spends most of its
  * rounds in, since the dominant guard blocks batching only while a
  * few pairs tower over the rest.
  * Lineage is truncated per round with the same
  * [[graft.core.Checkpoints]] hygiene as `Dedup.connectedComponents`
  * (reliable `checkpoint()` under a configured dir, superseded rounds
  * deleted), so plans do not grow with `numMerges`. Encoding is one
  * distinct-word pass through the broadcast merge table + a join back —
  * corpus-sized work is a single shuffle, independent of merge count.
  */
object Bpe {

  /** Learn `numMerges` merges over the corpus. Returns
    * `(rank, lhs, rhs, cnt)` with rank dense from 1 in merge order;
    * stops early when no pair reaches `minPairCount`.
    */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): DataFrame =
    learnWithRounds(docs, textCol, numMerges, minPairCount)._1

  /** [[learn]], also returning the number of Spark job rounds it took —
    * `rounds < merges` whenever batching compressed the loop.
    */
  def learnWithRounds(docs: DataFrame, textCol: String, numMerges: Int,
                      minPairCount: Long = 2L,
                      maxBatch: Int = 64): (DataFrame, Int) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    import graft.core.Checkpoints
    val words = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("w"), "").as("syms"))
    var cur = Checkpoints.truncate(words)
    var prevCp = Checkpoints.pathOf(cur)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    // SMALL-VOCABULARY FAST PATH (the connectedComponents discipline):
    // the loop's unit of work is the DISTINCT-WORD table — vocabulary-
    // not corpus-sized — and each distributed round costs ~4 jobs of
    // driver latency regardless of data. When the vocabulary fits the
    // (conf-gated, just-counted) bound, collect (freq, syms) once and
    // run the IDENTICAL loop locally: same pair counts (integer sums),
    // same `(cnt DESC, lhs, rhs)` ranking under Spark's binary UTF-8
    // string order, same [[selectBatch]] (shared verbatim), same
    // one-pass-per-merge application as [[graft.functions.BpeRuntime
    // .applyMerges]] — so the merge table and the round count are
    // bit-identical to the distributed loop (spec-pinned). A corpus
    // with a production-scale vocabulary takes the distributed rounds
    // unchanged; set spark.graft.bpe.localVocabLimit=0 to force them.
    val localLimit = spark.conf
      .get("spark.graft.bpe.localVocabLimit", "200000").toLong
    val vocab = cur.count()
    if (vocab <= localLimit) {
      var wordsL = cur.collect().map(r =>
        (r.getLong(0), r.getSeq[String](1).toArray))
      Checkpoints.delete(sc, prevCp) // nothing distributed survives
      val u = (s: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s)
      var doneL = false
      while (!doneL && merges.length < numMerges) {
        val counts =
          scala.collection.mutable.HashMap.empty[(String, String), Long]
        wordsL.foreach { case (f, syms) =>
          var i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + f)
            i += 1
          }
        }
        val budget = math.min(maxBatch, numMerges - merges.length)
        val ranked = counts.toArray
          .map { case ((l, r), c) => (l, r, c) }
          .sortWith { case ((la, ra, ca), (lb, rb, cb)) =>
            if (ca != cb) ca > cb
            else {
              val lc = u(la).compareTo(u(lb))
              if (lc != 0) lc < 0 else u(ra).compareTo(u(rb)) < 0
            }
          }
        val top = ranked.take(budget).toSeq
        if (top.isEmpty || top.head._3 < minPairCount) doneL = true
        else {
          rounds += 1
          val aSet = top.map(_._1).distinct.toSet
          val bSet = top.map(_._2).distinct.toSet
          val maxIn = ranked.filter(t => aSet(t._2))
            .groupBy(_._2).map { case (k, ts) => k -> ts.map(_._3).max }
          val maxOut = ranked.filter(t => bSet(t._1))
            .groupBy(_._1).map { case (k, ts) => k -> ts.map(_._3).max }
          val batch = selectBatch(top, minPairCount, maxIn, maxOut)
          batch.foreach { case (l, r, c) =>
            merges += ((merges.length + 1, l, r, c)) }
          wordsL = wordsL.map { case (f, syms) =>
            (f, applyBatchLocal(syms, batch)) }
        }
      }
      import spark.implicits._
      return (merges.toSeq.toDF("rank", "lhs", "rhs", "cnt"), rounds)
    }
    var done = false
    while (!done && merges.length < numMerges) {
      val pairs = cur.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("freq"), col("p").getField("0").as("lhs"),
          col("p").getField("1").as("rhs"))
        .groupBy("lhs", "rhs").agg(sum("freq").as("cnt"))
        .persist()
      val budget = math.min(maxBatch, numMerges - merges.length)
      // the ranked-prefix probe keeps its own collect: orderBy+limit
      // planned under a direct collect is TakeOrderedAndProject (a
      // single pass over the cached pairs) — folding it into a union
      // with the bound legs demotes it to a global sort-limit exchange,
      // measured strictly worse
      val top = pairs.orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(budget).collect()
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
          r.getAs[Long]("cnt")))
      if (top.isEmpty || top(0)._3 < minPairCount) { pairs.unpersist(); done = true }
      else {
        rounds += 1
        // Created-pair bounds for the batch-equivalence proof: a merge
        // (a,b) can only create pairs (X, ab) with count <= old cnt(X, a)
        // and (ab, Y) with count <= old cnt(b, Y) — every creating
        // occurrence `X a b` / `a b Y` contains the old pair. So
        // max-over-rhs==a and max-over-lhs==b from THIS round's table
        // bound everything a merge can spawn. (Fusing these two collects
        // into one union job was MEASURED slower under AQE — two direct
        // agg collects over the cached pairs beat the unioned plan.)
        val aSet = top.map(_._1).distinct.toSeq
        val bSet = top.map(_._2).distinct.toSeq
        val maxIn = pairs.filter(col("rhs").isin(aSet: _*))
          .groupBy("rhs").agg(max("cnt").as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val maxOut = pairs.filter(col("lhs").isin(bSet: _*))
          .groupBy("lhs").agg(max("cnt").as("m")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        pairs.unpersist()
        val batch = selectBatch(top, minPairCount, maxIn, maxOut)
        batch.foreach { case (l, r, c) => merges += ((merges.length + 1, l, r, c)) }
        val bc = sc.broadcast(batch.map { case (l, r, _) => Array(l, r) }.toArray)
        // truncate() is EAGER (checkpoint/localCheckpoint materialize on
        // call), so the next round's table exists before its parent's
        // checkpoint is deleted — no separate count() needed
        val next = Checkpoints.truncate(
          cur.withColumn("syms", bpeApply(col("syms"), bc)))
        Checkpoints.delete(sc, prevCp)
        prevCp = Checkpoints.pathOf(next)
        cur = next
      }
    }
    Checkpoints.delete(sc, prevCp) // the symbol table is not returned
    import spark.implicits._
    (merges.toSeq.toDF("rank", "lhs", "rhs", "cnt"), rounds)
  }

  /** [[graft.functions.BpeRuntime.applyMerges]] on plain strings: each
    * batched merge is one left-to-right non-overlapping scan, applied
    * in rank order — the local fast path's twin of the distributed
    * round's `bpeApply(col, bc)`.
    */
  private def applyBatchLocal(syms: Array[String],
                              batch: Seq[(String, String, Long)])
      : Array[String] = {
    var arr = syms
    batch.foreach { case (l, r, _) =>
      val merged = l + r
      val out = new Array[String](arr.length)
      var o = 0
      var j = 0
      while (j < arr.length) {
        if (j + 1 < arr.length && arr(j) == l && arr(j + 1) == r) {
          out(o) = merged; o += 1; j += 2
        } else { out(o) = arr(j); o += 1; j += 1 }
      }
      arr = java.util.Arrays.copyOf(out, o)
    }
    arr
  }

  /** The maximal prefix of the round's ranked pair list whose one-pass
    * application is provably identical to sequential BPE. A candidate
    * joins the batch only if ALL of:
    *
    *  1. PREFIX — every higher-ranked pair this round is already in the
    *     batch (first rejection stops selection), so no skipped pair
    *     whose count survives the batch can sneak ahead;
    *  2. DISJOINT — it shares no symbol with any batched pair or with a
    *     symbol a batched merge creates (disjoint merges cannot create,
    *     destroy, or conflate each other's occurrences, so batched
    *     counts stay exactly the pre-round counts sequential BPE would
    *     have seen);
    *  3. DOMINANT — its count strictly exceeds the created-pair bound of
    *     every earlier batch member (so no pair spawned mid-batch could
    *     outrank it under the `(cnt DESC, lhs, rhs)` order, ties
    *     included).
    */
  private[ops] def selectBatch(top: Seq[(String, String, Long)],
                               minPairCount: Long,
                               maxIn: Map[String, Long],
                               maxOut: Map[String, Long]): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var createdBound = -1L // below any real count, so the head always joins
    var stop = false
    for (cand @ (l, r, c) <- top if !stop) {
      if (c < minPairCount ||
          used(l) || used(r) || used(l + r) ||
          c <= createdBound) stop = true
      else {
        batch += cand
        used += l; used += r; used += (l + r)
        createdBound = math.max(createdBound,
          math.max(maxIn.getOrElse(l, 0L), maxOut.getOrElse(r, 0L)))
      }
    }
    batch.toSeq
  }

  /** A learned merge table collected to rank order for broadcasting. */
  def mergesOf(mergeTable: DataFrame): Array[Array[String]] =
    mergeTable.select("rank", "lhs", "rhs")
      .collect().sortBy(_.getAs[Int]("rank"))
      .map(r => Array(r.getAs[String]("lhs"), r.getAs[String]("rhs")))

  /** Encode each document as its BPE piece sequence under a learned
    * merge table. Returns `(doc_id, n_tokens, n_pieces, pieces_csv)` —
    * pieces comma-joined in document order (string-typed for
    * engine-portable comparison, like `TextAnalysis.encodeDocs`).
    *
    * The merge scan runs once per DISTINCT word; occurrences join the
    * encoded word back in (AQE broadcasts the distinct-word side while
    * it is small, degrading to a shuffle join on term).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Array[Array[String]]): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(merges)
    val occ = docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    val encoded = occ.select("term").distinct()
      .withColumn("pieces", bpeApply(split(col("term"), ""), bc))
      .select(col("term"), array_join(col("pieces"), ",").as("word_csv"),
        size(col("pieces")).as("n_word_pieces"))
    occ.join(encoded, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_word_pieces").cast("long")).as("n_pieces"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word_csv")))),
            s => s.getField("word_csv")), ",").as("pieces_csv"))
  }
}
