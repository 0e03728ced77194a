package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking for training-data preparation: slice each
  * document's token stream into fixed-size windows with a configurable
  * stride (overlap = chunkSize - stride), the standard step between a
  * cleaned corpus and a packed training set (complementing
  * [[Sampling.packSequences]], which packs whole short docs — chunking
  * splits long ones).
  */
object Chunking {

  /** Split each doc into `chunkSize`-token windows every `stride` tokens
    * (space-delimited tokens; the caller normalizes first if needed).
    * Every token lands in at least one chunk; the final chunk is the only
    * one allowed to run short. A doc with no more than `chunkSize` tokens
    * yields exactly one chunk.
    *
    * Returns `(doc_id, chunk_id, n_tokens, chunk_text)` with `chunk_id`
    * 0-based in document order.
    *
    * 100 TB shape: row-local throughout — `sequence`/`explode` fan the
    * chunk ids out and `slice` takes each window from the row's own token
    * array; no shuffle, no window function, and the explode multiplies
    * rows by ~n/stride, not tokens (each output row holds one chunk's
    * text). Degenerate giant docs are bounded by the caller's upstream
    * length gate (quality filters cap doc length long before this step).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      ceil((n - chunkSize).cast("double") / stride).cast("int") + 1)
    docs.select(col(idCol).as("doc_id"), toks.as("_toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("_toks"), col("chunk_id") * stride + 1, lit(chunkSize))
          .as("_chunk"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }
}
