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
  * ITERATION COST (document per VERDICT): learning is inherently
  * sequential — one aggregation job per merge round (pair counts over
  * the DISTINCT-WORD table, never the corpus: the classic
  * word-frequency-table optimization, so round cost scales with
  * vocabulary, not corpus size) plus one materialization of the updated
  * symbol table. Lineage is truncated per round with the same
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
            minPairCount: Long = 2L): DataFrame = {
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
    var done = false
    while (!done && merges.length < numMerges) {
      val best = cur.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("freq"), col("p").getField("0").as("lhs"),
          col("p").getField("1").as("rhs"))
        .groupBy("lhs", "rhs").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("cnt") < minPairCount) done = true
      else {
        val lhs: String = best(0).getAs[String]("lhs")
        val rhs: String = best(0).getAs[String]("rhs")
        val cnt: Long = best(0).getAs[Long]("cnt")
        merges += ((merges.length + 1, lhs, rhs, cnt))
        val bc = sc.broadcast(Array(Array(lhs, rhs)))
        val next = Checkpoints.truncate(
          cur.withColumn("syms", bpeApply(col("syms"), bc)))
        next.count() // materialize before deleting the round it derives from
        Checkpoints.delete(sc, prevCp)
        prevCp = Checkpoints.pathOf(next)
        cur = next
      }
    }
    Checkpoints.delete(sc, prevCp) // the symbol table is not returned
    import spark.implicits._
    merges.toSeq.toDF("rank", "lhs", "rhs", "cnt")
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
