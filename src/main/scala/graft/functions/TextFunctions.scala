package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the document-pipeline operators (dedup, language ID,
  * quality scoring, fingerprinting). All pure Column expressions — codegen'd,
  * no UDFs — so they distribute and push through Catalyst unchanged.
  */
object TextFunctions {

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Number of whitespace-delimited tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: runs of letters, runs of digits, or single
    * other non-space characters — a cheap deterministic proxy for a real
    * tokenizer's token count.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Normalized text: lowercase, whitespace runs collapsed, trimmed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact-content fingerprint: md5 of normalized text. md5 (not a
    * JVM-specific hash) so external systems reproduce it byte-for-byte.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Aggressive dedup-grain canonicalization — the standard pre-dedup
    * normalization in web-corpus pipelines (RefinedWeb/FineWeb MinHash
    * prep; reference exposes only raw-text dedup, `yaetos/libs` has no
    * normalizer): lowercase, punctuation/symbols to spaces, digit runs
    * collapsed to `0`, whitespace runs collapsed, trimmed. Re-renderings
    * that differ only in casing, punctuation, numeric ids, or spacing
    * map to one canonical form. Pure regex + lower — engine-portable
    * (RE2 and java.util.regex agree on these classes), so an external
    * oracle reproduces the form byte-for-byte.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
      "[^a-z0-9\\s]", " "), "[0-9]+", "0"), "\\s+", " "))

  /** Order-insensitive bag-of-words fingerprint: md5 over sorted tokens.
    * Detects token-reorder near-duplicates exactly.
    */
  def bowFingerprint(text: Column): Column =
    md5(concat_ws(" ", sort_array(tokens(text))))

  /** Word n-gram shingles (distinct), as an array column. Built from
    * `transform` over an index sequence — no explode here so callers choose
    * when to go long-format.
    */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(shinglesRaw(text, n))

  /** Word n-gram shingles WITH duplicates, in document order — the raw
    * stream repetition metrics need (dedup callers use [[shingles]]).
    */
  def shinglesRaw(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
}
