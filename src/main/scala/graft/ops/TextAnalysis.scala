package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token statistics, fingerprinting. Pure Column
  * expressions — fully codegen'd, no shuffles beyond the caller's aggs.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small and fixed so the oracle SQL can embed
    * the identical lists.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"))

  /** Language-ID scores + argmax prediction. Ties resolve in `stopwords`
    * declaration order (first match wins); zero hits → "und" (undetermined).
    */
  def langId(docs: DataFrame, idCol: String, textCol: String,
             keep: Seq[String] = Nil): DataFrame = {
    val toks = tokens(col(textCol))
    val base = docs.select(
      (col(idCol).as("doc_id") +: keep.map(col)) :+ toks.as("toks"): _*)
    val scored = stopwords.foldLeft(base) {
      case (df, (lang, words)) =>
        df.withColumn(s"hits_$lang",
          size(filter(col("toks"), t => words.map(w => t === w).reduce(_ || _)))
            .cast("long"))
    }
    val maxHits = greatest(stopwords.map(l => col(s"hits_${l._1}")): _*)
    val best = stopwords.map(_._1).foldRight(lit("und")) { (lang, rest) =>
      when(col(s"hits_$lang") === maxHits && col(s"hits_$lang") > 0, lit(lang))
        .otherwise(rest)
    }
    scored.select(
      ((col("doc_id") +: keep.map(col)) ++
        stopwords.map(l => col(s"hits_${l._1}")) :+ best.as("pred_lang")): _*)
  }

  /** Top-k adjacent-pair PMI — word2phrase-style collocation mining
    * (Mikolov et al. 2013): bigrams whose joint probability beats the
    * unigram-independence baseline are phrase candidates ("new york",
    * "machine learning") worth fusing before tokenizer training.
    * `pmi = ln((c_ab/M) / ((c_a/N)(c_b/N)))` micro-quantized;
    * `minCount` suppresses the noisy low-support tail.
    *
    * Scale shape: bigrams build row-locally (the [[bigramLmScore]]
    * shape — no positional self-join), ONE (a,b)-keyed contraction,
    * two broadcast unigram attaches, scalar totals on a broadcast
    * single row, and the global top-k plans as TakeOrdered (no global
    * sort materializes).
    *
    * Output: `(a, b, c_ab, pmi_micro)`, top `k` by
    * `(pmi_micro DESC, a, b)`.
    */
  def pmiPairs(docs: DataFrame, textCol: String,
               minCount: Long = 5L, k: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(k >= 1, s"k must be >= 1: $k")
    val toks = docs.select(tokens(col(textCol)).as("_l"))
      .select(filter(col("_l"), _ =!= "").as("_l"))
    val uni = toks.select(explode(col("_l")).as("_t"))
      .groupBy("_t").agg(count(lit(1)).as("_c"))
    val uniTot = uni.agg(sum("_c").as("_n"))
    val bi = toks.filter(size(col("_l")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(_l) - 2), i -> struct(_l[i] AS a, _l[i+1] AS b))"))
        .as("_p"))
      .select(col("_p.a").as("a"), col("_p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val biTot = bi.agg(sum("c_ab").as("_m"))
    bi
      .join(broadcast(uni.select(col("_t").as("a"), col("_c").as("_ca"))), "a")
      .join(broadcast(uni.select(col("_t").as("b"), col("_c").as("_cb"))), "b")
      .crossJoin(broadcast(uniTot))
      .crossJoin(broadcast(biTot))
      .withColumn("pmi_micro",
        round(round(log((col("c_ab").cast("double") / col("_m")) /
          ((col("_ca").cast("double") / col("_n")) *
            (col("_cb").cast("double") / col("_n")))), 6) * lit(1e6), 0)
          .cast("long"))
      .select(col("a"), col("b"), col("c_ab"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Windowed co-occurrence PMI — [[pmiPairs]] generalized from
    * adjacent bigrams to a ±`window` skip-gram context (the GloVe/
    * word2vec counting shape): every unordered token pair within
    * `window` positions counts once, pairs orient alphabetically, and
    * equal-token pairs are excluded. Collocations that never touch
    * ("new … york times", verb–object frames) surface here and not in
    * the bigram table.
    *
    * Scale shape identical to [[pmiPairs]]: the pair explosion is
    * row-local (an O(window) inner transform per position — cost
    * `tokens × window`, the standard skip-gram bound), one contraction
    * to pair grain, broadcast unigram joins, TakeOrdered top-k. PMI in
    * micro units through the one shared rounding.
    */
  def coocPmi(docs: DataFrame, textCol: String, window: Int = 3,
              minCount: Long = 5L, k: Int = 20): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(k >= 1, s"k must be >= 1: $k")
    val toks = docs.select(tokens(col(textCol)).as("_l"))
      .select(filter(col("_l"), _ =!= "").as("_l"))
    val uni = toks.select(explode(col("_l")).as("_t"))
      .groupBy("_t").agg(count(lit(1)).as("_c"))
    val uniTot = uni.agg(sum("_c").as("_n"))
    val bi = toks.filter(size(col("_l")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(_l) - 2), i ->
           |  transform(sequence(i + 1, least(i + $window, size(_l) - 1)), j ->
           |    IF(_l[i] < _l[j], struct(_l[i] AS a, _l[j] AS b),
           |       struct(_l[j] AS a, _l[i] AS b)))))""".stripMargin))
        .as("_p"))
      .select(col("_p.a").as("a"), col("_p.b").as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val biTot = bi.agg(sum("c_ab").as("_m"))
    bi
      .join(broadcast(uni.select(col("_t").as("a"), col("_c").as("_ca"))), "a")
      .join(broadcast(uni.select(col("_t").as("b"), col("_c").as("_cb"))), "b")
      .crossJoin(broadcast(uniTot))
      .crossJoin(broadcast(biTot))
      .withColumn("pmi_micro",
        round(round(log((col("c_ab").cast("double") / col("_m")) /
          ((col("_ca").cast("double") / col("_n")) *
            (col("_cb").cast("double") / col("_n")))), 6) * lit(1e6), 0)
          .cast("long"))
      .select(col("a"), col("b"), col("c_ab"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Trending terms — day-over-day frequency growth (the corpus-drift /
    * emerging-topic monitor): per (term, day) counts, each day compared
    * against the term's PREVIOUS OBSERVED day (lag over the term's own
    * day sequence, so sparse terms compare against their own cadence —
    * the [[graft.ops.Stats.ewmaAnomaly]] convention), ranked by growth.
    * `growth_micro = n / prev_n` micro-quantized; `minCount` gates both
    * sides so 1→3 noise cannot outrank 100→300.
    *
    * Scale shape: one (term, day)-grain contraction from the corpus
    * scan, a term-partitioned lag window over that contracted table,
    * TakeOrdered top-k.
    *
    * Output: `(term, day, n, prev_day, prev_n, growth_micro)`, top `k`
    * by `(growth_micro DESC, term, day)`.
    */
  def trendingTerms(docs: DataFrame, textCol: String, dayCol: String,
                    minCount: Long = 5L, k: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(k >= 1, s"k must be >= 1: $k")
    val td = docs
      .select(col(dayCol).as("day"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "day").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("term").orderBy("day")
    td
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev_n") >= minCount && col("n") >= minCount)
      .withColumn("growth_micro",
        round(round(col("n").cast("double") / col("prev_n"), 6) * lit(1e6), 0)
          .cast("long"))
      .select(col("term"), col("day"), col("n"), col("prev_day"),
        col("prev_n"), col("growth_micro"))
      .orderBy(col("growth_micro").desc, col("term"), col("day"))
      .limit(k)
  }

  /** Per-document token-distribution statistics — the
    * gibberish/boilerplate axis [[qualityExpr]]'s surface ratios miss:
    * Shannon entropy of the document's own token distribution (low =
    * repetitive template, high = diverse prose) and type-token ratio.
    * Per-token `-p·ln p` contributions micro-quantize BEFORE the
    * per-doc sum, so entropy is an order-free BIGINT sum. Two
    * (doc, token)-grain contractions; empty-token docs are absent.
    *
    * Output: `(idCol, n_tokens, n_distinct, ttr_micro, entropy_micro)`.
    */
  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_t"))
      .filter(col("_t") =!= "")
      .groupBy("_id", "_t").agg(count(lit(1)).as("_c"))
    val n = Window.partitionBy("_id")
    tf.withColumn("_n", sum("_c").over(n))
      .withColumn("_p", col("_c").cast("double") / col("_n"))
      .withColumn("_h_micro",
        round(round(-col("_p") * log(col("_p")), 6) * lit(1e6), 0).cast("long"))
      .groupBy(col("_id"))
      .agg(max("_n").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(round(count(lit(1)).cast("double") / max("_n"), 6) * lit(1e6), 0)
          .cast("long").as("ttr_micro"),
        sum("_h_micro").as("entropy_micro"))
      .select(col("_id").as(idCol), col("n_tokens"), col("n_distinct"),
        col("ttr_micro"), col("entropy_micro"))
  }

  /** Confusion matrix of [[langId]] against a DECLARED language column —
    * the classifier-drift monitor for an ingest whose sources self-label
    * language (and the standard eval grid before trusting either side).
    * `frac_micro` is the row-normalized rate (`n / Σ_pred n` per
    * declared language) in micro-units. Languages the heuristic has no
    * stopword list for show up honestly as `und` / misfire rows.
    *
    * Scale shape: prediction rides the corpus scan row-locally (the
    * `keep` passthrough — NO id join back), then one map-side-combined
    * aggregation onto a |langs|² key space; the row totals are a window
    * over that tiny grid.
    */
  def langConfusion(docs: DataFrame, idCol: String, textCol: String,
                    declaredCol: String): DataFrame = {
    val pred = langId(docs, idCol, textCol, keep = Seq(declaredCol))
    val grid = pred
      .groupBy(col(declaredCol).as("declared"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy("declared")
    grid
      .withColumn("frac_micro",
        round(round(col("n").cast("double") / sum("n").over(tot), 6) * lit(1e6), 0)
          .cast("long"))
      .select(col("declared"), col("pred_lang"), col("n"), col("frac_micro"))
  }

  /** Quality metrics: char/token counts, mean token length, punctuation,
    * digit, and stopword ratios, and a composite score. All ratios rounded
    * to 4 decimals for cross-engine comparability. A healthy natural-text
    * stopword ratio sits well above machine-generated or boilerplate text,
    * so the composite rewards it up to a 0.2 cap.
    */
  private def punctRatio(text: Column): Column = {
    val txt = lower(text)
    round(length(regexp_replace(txt, "[a-z0-9\\s]", "")).cast("double") /
      length(txt).cast("long"), 4)
  }

  private def digitRatio(text: Column): Column = {
    val txt = lower(text)
    round(length(regexp_replace(txt, "[^0-9]", "")).cast("double") /
      length(txt).cast("long"), 4)
  }

  private def stopwordRatio(text: Column): Column = {
    val enStops = stopwords.head._2
    round(size(filter(tokens(text),
      t => enStops.map(w => t === w).reduce(_ || _))).cast("double") /
      tokenCount(text).cast("long"), 4)
  }

  /** The composite quality score as a single Column — a pure function of
    * the text column already on the row, so a quality GATE is an in-place
    * `df.filter(qualityExpr(col("text")) >= minQ)`: zero joins, zero
    * shuffles, pushdown-eligible. [[qualityScore]] reuses this exact
    * expression for its `quality` column, so gate and report can never
    * disagree.
    */
  def qualityExpr(text: Column): Column =
    round(least(lit(1.0), tokenCount(text).cast("long").cast("double") / 100) *
      (lit(1.0) - punctRatio(text)) * (lit(1.0) - digitRatio(text)) *
      (lit(0.8) + least(lit(0.2), stopwordRatio(text))), 4)

  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = lower(col(textCol))
    val nChars = length(txt).cast("long")
    val nToks = tokenCount(col(textCol)).cast("long")
    docs.select(
      col(idCol).as("doc_id"),
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      round((nChars - (nToks - 1)).cast("double") / nToks, 4).as("mean_tok_len"),
      punctRatio(col(textCol)).as("punct_ratio"),
      digitRatio(col(textCol)).as("digit_ratio"),
      stopwordRatio(col(textCol)).as("stopword_ratio"),
      qualityExpr(col(textCol)).as("quality"))
  }

  /** Intra-document repetition ratio (the Gopher/RefinedWeb-style quality
    * signal): 1 - distinct/total word n-grams. Boilerplate, keyword spam,
    * and degenerate generations repeat n-grams heavily; clean prose sits
    * near 0. Pure columns — no shuffle.
    */
  def repetitionRatio(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    val sh = shinglesRaw(col(textCol), n) // duplicates are the signal
    val total = size(sh).cast("long")
    docs.select(col(idCol).as("doc_id"),
      total.as("n_ngrams"),
      size(array_distinct(sh)).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        when(col("n_ngrams") === 0, 0.0).otherwise(
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 4)))
  }

  /** Benchmark decontamination: flag corpus docs sharing at least
    * `minShared` distinct word n-grams with ANY benchmark document — the
    * standard test-set-overlap removal step before training. Inverted-
    * index shape: the join key is the n-gram, so the benchmark (small)
    * broadcasts and the corpus shuffles once for the aggregation; the
    * corpus×benchmark cross product never materializes.
    *
    * Returns (doc_id, n_shared, contaminated).
    */
  def contaminationFlags(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 8, minShared: Int = 1,
                         maxBroadcastGrams: Long = 10000000L,
                         benchGramRows: Option[Long] = None): DataFrame = {
    val benchGrams = benchmark
      .select(explode(shingles(col(textCol), n)).as("gram"))
      .distinct()
    val corpusGrams = corpus.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), n)).as("gram"))
    // eval sets are small by definition, so the gram set broadcasts; gate
    // it anyway (one count over the SMALL side — skipped when the caller
    // passes `benchGramRows` from a prior count, the probeRows/deltaRows
    // convention) so an oversized benchmark degrades to a shuffle join
    // instead of an 8GB-broadcast failure
    val benchSide =
      if (benchGramRows.getOrElse(benchGrams.count()) <= maxBroadcastGrams)
        broadcast(benchGrams)
      else benchGrams
    val shared = corpusGrams.join(benchSide, "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= minShared)
  }

  /** [[contaminationFlags]] with a BLOOM pre-prune — the middle regime:
    * the benchmark gram set is too big to broadcast exactly (an exact
    * set of 10^8 grams is GBs of strings) but its bloom is not (10^8
    * items at 1% fpp ≈ 120 MB of bits; at the default 10^7 ≈ 12 MB).
    * Corpus grams filter through the broadcast bloom FIRST, so only
    * might-match candidates (true hits + fpp of everything else) reach
    * the shuffle join; the exact join then removes every false positive,
    * which is why this returns BIT-IDENTICAL output to
    * [[contaminationFlags]] (q135 holds it to q55's oracle) — the bloom
    * changes the plan, never the answer.
    */
  def contaminationFlagsBloom(corpus: DataFrame, benchmark: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 8, minShared: Int = 1,
                              expectedGrams: Long = 10000000L,
                              fpp: Double = 0.01): DataFrame = {
    val benchGrams = benchmark
      .select(explode(shingles(col(textCol), n)).as("gram"))
      .distinct()
    val corpusGrams = corpus.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), n)).as("gram"))
    val candidates = Joins.bloomPrune(corpusGrams, benchGrams,
      "gram", "gram", expectedGrams, fpp)
    val shared = candidates.join(benchGrams, "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol).as("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= minShared)
  }

  /** FUZZY decontamination: corpus documents that are MinHash
    * near-duplicates of a reference (benchmark/eval) document, with
    * exact-Jaccard verification — catches lightly paraphrased or
    * re-rendered eval material that exact n-gram overlap
    * ([[contaminationFlags]]) and exact span matching
    * (`Dedup.dedupSpansAgainst`) both miss. Returns one row per
    * contaminated (doc, ref) pair: `(doc_id, ref_id, jaccard)`.
    *
    * Ids must be unique ACROSS both inputs (they share a shingle space
    * — offset the reference ids). Banding defaults to 2-row bands
    * (64/32), wider than the dedup default, because decontamination is
    * recall-critical: at threshold 0.7 the per-pair miss probability is
    * ~(1 - 0.49)^32 ≈ 1e-9, so a contaminated document effectively
    * cannot slip through the candidate stage; the extra candidates cost
    * only verification work, and verification is exact.
    *
    * 100 TB shape: inherited from `Dedup.minhashLshPairsAcross` — both
    * sides shuffle once on (band, bandhash); candidates are ref×corpus
    * within a bucket only; the eval set is tiny, so its side is noise.
    */
  def fuzzyContamination(corpus: DataFrame, ref: DataFrame,
                         idCol: String, textCol: String,
                         threshold: Double = 0.7, n: Int = 3,
                         numHashes: Int = 64, numBands: Int = 32,
                         maxBandFreq: Option[Int] = None): DataFrame =
    Dedup.minhashLshPairsAcross(ref, corpus, idCol, textCol, threshold,
        n, numHashes, numBands, maxBandFreq)
      .select(col("b_id").as("doc_id"), col("a_id").as("ref_id"),
        col("jaccard"))

  /** [[fuzzyContamination]] as a filter: the corpus minus every document
    * fuzzy-matching the reference set.
    */
  def dropFuzzyContaminated(corpus: DataFrame, ref: DataFrame,
                            idCol: String, textCol: String,
                            threshold: Double = 0.7): DataFrame =
    corpus.join(
      fuzzyContamination(corpus, ref, idCol, textCol, threshold)
        .select(col("doc_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** PII-pattern redaction: replace email addresses and long digit
    * sequences (phone-like) with placeholder tags. Regex-only — the
    * honest scope of pattern scrubbing; entity-level PII needs a model,
    * which plugs into the same column seam.
    */
  /** The RE2-portable PII patterns shared by [[redactPii]] and
    * [[Checks.piiProfile]] — whitespace spelled out, not \s: Java's \s
    * includes \x0B, RE2's does not, and the explicit class keeps Spark
    * and the DuckDB oracle identical.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+?[0-9][0-9()\\- \\t\\n\\f\\r]{7,}[0-9]",
    "ipv4" -> "([0-9]{1,3}\\.){3}[0-9]{1,3}")

  def redactPii(text: Column): Column = {
    val email = regexp_replace(text, piiPatterns.head._2, "<EMAIL>")
    regexp_replace(email, piiPatterns(1)._2, "<PHONE>")
  }

  /** Top-`k` TF-IDF terms per document — the classic keyword/topic signal
    * for corpus exploration and quality clustering. `score = tf ·
    * ln(n_docs / df)`, ranked per document by `(round(score, 6) DESC,
    * term ASC)` so ranking is deterministic cross-engine.
    *
    * 100 TB shape: term frequencies aggregate with map-side combine on
    * (doc, term); document frequencies aggregate the already-distinct
    * (doc, term) pairs on term (vocab-sized result). The DF table joins
    * back BROADCAST while it fits `maxBroadcastTerms`, else it degrades
    * to a shuffle join on term — never an error. The corpus doc count
    * rides a broadcast-able single-row cross join (no driver collect).
    * Top-k is a window over doc_id — per-doc state only.
    *
    * Returns `(doc_id, term, tf, df_docs, score, rank)`.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3,
                    maxBroadcastTerms: Long = 10000000L,
                    vocabTerms: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val termRows = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = termRows.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // distinct-term count gate, skipped when the caller passes
    // `vocabTerms` from a prior count (the probeRows/deltaRows convention)
    val vocabN = vocabTerms.getOrElse(
      dfTable.limit(math.min(maxBroadcastTerms + 1, Int.MaxValue.toLong).toInt)
        .count())
    val dfSide =
      if (vocabN <= maxBroadcastTerms) broadcast(dfTable)
      else dfTable
    val scored = tf.join(dfSide, "term").crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df_docs")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(round(col("score"), 6).desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df_docs"),
        round(col("score"), 4).as("score"), col("rank"))
  }

  /** Unigram language-model score per document — the cheap version of the
    * CCNet/Wikipedia-LM perplexity filter (Wenzek et al. 2020): train
    * add-`smoothing` unigram probabilities on the corpus itself, then
    * score each document by its mean token log-probability and
    * perplexity. Documents full of rare/garbage tokens score low
    * `avg_logprob` (high `ppl`) and can be gated exactly like the
    * heuristic [[qualityExpr]].
    *
    * Output: `(idCol, n_tokens, avg_logprob, ppl)`, rounded 4/2 decimals.
    * Empty-token documents are absent from the output (no tokens = no
    * score), mirroring the SQL GROUP BY.
    *
    * Scale shape: ONE corpus-wide token aggregation builds the vocabulary
    * (map-side combined); the token→probability attach is an equi-join
    * AQE broadcasts when the vocabulary is small and sort-merges when it
    * is not (no driver-side vocab materialization either way); the scalar
    * (N, V) totals ride along as a broadcast single-row cross join. The
    * per-doc mean is one final doc-keyed aggregation.
    */
  def unigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                     smoothing: Double = 1.0): DataFrame = {
    require(smoothing > 0, s"smoothing must be > 0: $smoothing")
    val toks = docs.select(col(idCol).as("_id"),
        explode(tokens(col(textCol))).as("_tok"))
      .filter(col("_tok") =!= "")
    val vocab = toks.groupBy("_tok").agg(count(lit(1)).as("_c"))
    val tot = vocab.agg(sum("_c").as("_n"), count(lit(1)).as("_v"))
    toks.join(vocab, "_tok").crossJoin(broadcast(tot))
      .withColumn("_lp", log((col("_c") + lit(smoothing)) /
        (col("_n") + lit(smoothing) * col("_v"))))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("_lp")), 4).as("avg_logprob"),
        round(exp(-avg(col("_lp"))), 2).as("ppl"))
      .select(col("_id").as(idCol), col("n_tokens"),
        col("avg_logprob"), col("ppl"))
  }

  /** Deterministic word dropout — the denoising-augmentation twin of
    * [[spanCorruption]] (word-level noise a la BART/word-dropout
    * regularization): token `i` of a document survives iff the portable
    * 60-bit md5 hash of `(salt, doc, position, token)` clears the
    * `rate` threshold. Purely positional + content-keyed, so the SAME
    * (doc, rate, salt) always drops the same words — reproducible
    * augmentation with no RNG state, and a pure shuffle-free column
    * plan (a two-arg `filter` lambda over the token array; the 0-based
    * lambda index is part of the replay contract).
    *
    * Output: `(idCol, n_tokens, n_kept, text_out)`.
    */
  def wordDropout(docs: DataFrame, idCol: String, textCol: String,
                  rate: Double = 0.1, salt: String = "dropout"): DataFrame = {
    require(rate >= 0 && rate < 1, s"rate must be in [0, 1): $rate")
    val thr = dropoutThreshold(rate)
    val toks = tokens(col(textCol))
    val kept = filter(toks, (t, i) =>
      conv(substring(md5(concat(lit(salt), col(idCol).cast("string"),
        lit(":"), i.cast("string"), lit(":"), t)), 1, 15), 16, 10)
        .cast("long") >= lit(thr))
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, " ").as("text_out"))
  }

  /** The integer drop threshold for `rate` over the 60-bit hash space —
    * exposed so oracle SQL embeds the IDENTICAL literal the operator
    * compares against.
    */
  def dropoutThreshold(rate: Double): Long =
    (rate * (1L << 60).toDouble).toLong

  /** Deterministic T5-style span corruption (Raffel et al. 2020 §3.1.4,
    * the denoising objective): the token stream is cut into fixed
    * `spanLen` blocks; a block is masked iff its portable md5 hash lands
    * under `maskRate`; the input replaces each masked block with
    * `<extra_id_K>` (K = masked blocks before it) and the target lists
    * the sentinels with their recovered tokens. Block-ALIGNED masking
    * (vs T5's sampled span lengths) is the deliberate twist that makes
    * the objective STATELESS per (doc, block): no sequential sampling
    * pass, so the pair construction is a pure column plan on the token
    * array — shuffle-free, and bit-replayable on any engine for the
    * dual-oracle contract.
    *
    * Output: `(idCol, n_blocks, n_masked, input_text, target_text)`.
    * Docs whose text tokenizes empty are absent (no blocks).
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
                     spanLen: Int = 3, maskRate: Double = 0.15,
                     salt: String = "t5"): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1: $spanLen")
    require(maskRate > 0 && maskRate < 1, s"maskRate out of (0,1): $maskRate")
    val bound = math.round(maskRate * 10000).toInt
    val nBlocks =
      ceil(size(col("_l")).cast("double") / spanLen).cast("int")
    val blocks = docs
      .select(col(idCol).as("_id"), tokens(col(textCol)).as("_l"))
      .filter(size(col("_l")) > 0)
      .filter(col("_l") =!= array(lit("")))
      .select(col("_id"), col("_l"),
        explode(sequence(lit(0), nBlocks - 1)).as("_b"))
      .withColumn("_btext", concat_ws(" ",
        slice(col("_l"), col("_b") * spanLen + lit(1), lit(spanLen))))
      .withColumn("_masked",
        pmod(graft.ops.Sketches.hash60Salted(col("_b"),
          concat(lit(salt), col("_id").cast("string"), lit(":"))),
          lit(10000L)) < bound)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val numbered = blocks.withColumn("_k",
      coalesce(sum(when(col("_masked"), 1L).otherwise(0L)).over(w), lit(0L)))
    numbered.groupBy("_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("_masked"), 1L).otherwise(0L)).as("n_masked"),
        array_join(transform(
          array_sort(collect_list(struct(col("_b"), col("_masked"),
            col("_k"), col("_btext")))),
          s => when(s.getField("_masked"),
            concat(lit("<extra_id_"), s.getField("_k"), lit(">")))
            .otherwise(s.getField("_btext"))), " ").as("input_text"),
        array_join(transform(
          filter(array_sort(collect_list(struct(col("_b"), col("_masked"),
            col("_k"), col("_btext")))), s => s.getField("_masked")),
          s => concat(lit("<extra_id_"), s.getField("_k"), lit("> "),
            s.getField("_btext"))), " ").as("target_text"))
      .select(col("_id").as(idCol), col("n_blocks"), col("n_masked"),
        col("input_text"), col("target_text"))
  }

  /** Bigram LM scoring with Stupid Backoff (Brants et al. 2007 §4 — the
    * smoothing built FOR distributed count tables: no normalization pass,
    * just raw counts and a fixed backoff factor). Scores every `score`
    * document against tables trained on `train`:
    * `S(c|p) = bc/pc` when the bigram was seen, else `α·uc/N` (unigram
    * backoff), else `α²/N` (out-of-vocabulary floor). Train ≠ score is
    * the point — self-scoring never backs off (every bigram of the doc
    * is in the corpus), so held-out scoring is where the model separates
    * fluent from garbage.
    *
    * Output per doc: `n_bigrams`, `avg_logscore` (round 4),
    * `backoff_rate`, `oov_rate` (round 4).
    *
    * 100 TB shape: bigrams are built ROW-LOCALLY (`transform` over the
    * token array — no positional self-join), counts aggregate with
    * map-side combine, and scoring is three equi-joins ((p,c), p, c)
    * AQE broadcasts when the tables are small; the scalar N rides along
    * as a broadcast single-row cross join. Nothing touches the driver.
    */
  def bigramLmScore(score: DataFrame, train: DataFrame, idCol: String,
                    textCol: String, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    def toksArr(df: DataFrame) =
      df.select(col(idCol).as("_id"), tokens(col(textCol)).as("_l"))
    def bigrams(df: DataFrame) = toksArr(df)
      .select(col("_id"), explode(when(size(col("_l")) >= 2,
          transform(sequence(lit(0), size(col("_l")) - 2),
            i => struct(element_at(col("_l"), i + 1).as("p"),
              element_at(col("_l"), i + 2).as("c"))))
        .otherwise(array().cast("array<struct<p:string,c:string>>")))
        .as("_b"))
      .select(col("_id"), col("_b.p").as("_p"), col("_b.c").as("_c"))
      .filter(col("_p") =!= "" && col("_c") =!= "")
    val trainToks = toksArr(train)
      .select(explode(col("_l")).as("_tok")).filter(col("_tok") =!= "")
    val uni = trainToks.groupBy("_tok").agg(count(lit(1)).as("_uc"))
    val tot = uni.agg(sum("_uc").as("_n"))
    val bigCounts = bigrams(train).groupBy("_p", "_c")
      .agg(count(lit(1)).as("_bc"))
    bigrams(score)
      .join(bigCounts, Seq("_p", "_c"), "left")
      .join(uni.select(col("_tok").as("_p"), col("_uc").as("_pc")),
        Seq("_p"), "left")
      .join(uni.select(col("_tok").as("_c"), col("_uc").as("_cc")),
        Seq("_c"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("_lp",
        when(col("_bc").isNotNull, log(col("_bc") / col("_pc")))
          .when(col("_cc").isNotNull,
            log(lit(alpha) * col("_cc") / col("_n")))
          .otherwise(log(lit(alpha * alpha) / col("_n"))))
      .withColumn("_backoff", when(col("_bc").isNotNull, 0L).otherwise(1L))
      .withColumn("_oov", when(col("_cc").isNull, 1L).otherwise(0L))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg("_lp"), 4).as("avg_logscore"),
        round(sum("_backoff").cast("double") / count(lit(1)), 4)
          .as("backoff_rate"),
        round(sum("_oov").cast("double") / count(lit(1)), 4).as("oov_rate"))
      .select(col("_id").as(idCol), col("n_bigrams"), col("avg_logscore"),
        col("backoff_rate"), col("oov_rate"))
  }

  /** CCNet-style head/middle/tail perplexity split (Wenzek et al. 2020
    * §4.3): score every document with the corpus-trained unigram LM
    * ([[unigramLmScore]]), take per-`langCol` terciles of the perplexity,
    * and tag each document `head` (lowest ppl — most fluent), `middle`,
    * or `tail`. CCNet keeps head+middle for training and drops (or
    * down-weights) the tail; the bucket column makes that a one-line
    * filter.
    *
    * Thresholds are interpolated terciles rounded to 4 decimals BEFORE
    * the comparison — ppl carries 2 decimals, so the rounding absorbs
    * last-ulp interpolation differences between engines and the bucket
    * assignment replays exactly (the dual-engine contract).
    *
    * Scale shape: the LM scoring is [[unigramLmScore]]'s one-aggregation
    * + one-join plan; the tercile aggregation with `exact = true` uses
    * Spark's exact `percentile`, which materializes each language's ppl
    * values in one aggregation buffer — fine up to ~10^8 docs per
    * language, and per-LANGUAGE, never per-corpus. Past that, pass
    * `exact = false` for `approx_percentile` (GK sketch, mergeable,
    * bounded memory) and accept ±`accuracy` rank error at the two cut
    * points; the cuts then stop being engine-replayable, which is why
    * exact is the default at validation scale.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, exact: Boolean = true,
                        accuracy: Int = 10000): DataFrame = {
    val scored = unigramLmScore(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
    def cut(p: String) =
      if (exact) expr(s"percentile(ppl, $p)")
      else expr(s"approx_percentile(ppl, $p, $accuracy)")
    val cuts = scored.groupBy(col(langCol))
      .agg(round(cut("1.0D/3"), 4).as("t1"),
        round(cut("2.0D/3"), 4).as("t2"))
    scored.join(broadcast(cuts), Seq(langCol))
      .withColumn("bucket",
        when(col("ppl") <= col("t1"), lit("head"))
          .when(col("ppl") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(langCol), col("ppl"), col("t1"), col("t2"),
        col("bucket"))
  }

  /** Gopher-style rule-based quality flags (Rae et al. 2021, Table A1 —
    * the deterministic subset): per-document word/line structure metrics
    * and the conjunction `keep` every rule passes. All pure Column
    * expressions over the row's own text, APPENDED to the input row — no
    * shuffle, no join; the gate is an in-place `filter(col("keep"))`
    * exactly like [[qualityExpr]].
    *
    * Words are `[^ \t\n\f\r]+` runs (explicit class: RE2-portable, unlike
    * Java's `\s`); lines split on `\n`. Metrics: word count bounds, mean
    * word length bounds, symbol-word ratio (`#`-prefixed or `...`-bearing
    * words), alphabetic-word ratio, bullet-line and ellipsis-line
    * fractions, and distinct-stopword hits (the [[stopwords]] `en` list).
    * Ratios round to 4 decimals; zero-word docs report 0 ratios and fail
    * the word-count rule.
    */
  def gopherFlags(docs: DataFrame, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
                  maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                  minStopHits: Int = 2): DataFrame = {
    val words = regexp_extract_all(col(textCol), lit("[^ \\t\\n\\f\\r]+"), lit(0))
    val lines = split(col(textCol), "\n")
    val nW = size(words).cast("long")
    val nL = size(lines).cast("long")
    val charSum = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val symbolW = size(filter(words,
      w => w.startsWith("#") || w.contains("...")))
    val alphaW = size(filter(words, w => w.rlike("[a-zA-Z]")))
    val bulletL = size(filter(lines, l => ltrim(l).startsWith("- ") ||
      ltrim(l).startsWith("* ") || ltrim(l).startsWith("• ")))
    val ellipsisL = size(filter(lines,
      l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
    val stopHits = stopwords.head._2
      .map(w => when(array_contains(words, w), 1L).otherwise(0L))
      .reduce(_ + _)
    def ratio(num: Column, den: Column): Column =
      when(den === 0, 0.0).otherwise(round(num.cast("double") / den, 4))
    val meanLen = ratio(charSum, nW)
    val symR = ratio(symbolW, nW)
    val alphaR = ratio(alphaW, nW)
    val bulletF = ratio(bulletL, nL)
    val ellipsisF = ratio(ellipsisL, nL)
    docs.withColumn("n_words", nW).withColumn("n_lines", nL)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symR)
      .withColumn("alpha_ratio", alphaR)
      .withColumn("bullet_frac", bulletF)
      .withColumn("ellipsis_frac", ellipsisF)
      .withColumn("stop_hits", stopHits)
      .withColumn("keep",
        nW >= minWords && nW <= maxWords &&
          meanLen >= minMeanLen && meanLen <= maxMeanLen &&
          symR <= maxSymbolRatio && alphaR >= minAlphaRatio &&
          bulletF <= maxBulletFrac && ellipsisF <= maxEllipsisFrac &&
          stopHits >= minStopHits)
  }

  /** The metric columns [[gopherFlags]] appends — `drop(gopherCols: _*)`
    * restores the input schema after an in-place gate.
    */
  val gopherCols: Seq[String] = Seq("n_words", "n_lines", "mean_word_len",
    "symbol_ratio", "alpha_ratio", "bullet_frac", "ellipsis_frac",
    "stop_hits", "keep")

  /** Deterministic vocabulary induction: the `maxSize` most frequent
    * tokens, ids dense 1..maxSize by `(count DESC, term ASC)` — a pure
    * function of the corpus, so two runs (or two engines) assign
    * identical ids. Id 0 is reserved for out-of-vocabulary
    * ([[encodeDocs]]'s unk). Returns `(term, token_id, cnt)`.
    *
    * Scale shape: one map-side-combined token count (the corpus-sized
    * shuffle), `minCount` pre-filter bounds the ranked set, and the
    * global rank-limit plans as `TakeOrderedAndProject` (per-partition
    * top-k, then a merge of k-row heads) — the full vocabulary is never
    * sorted on one task. Plan-audited via q97.
    */
  def buildVocab(docs: DataFrame, textCol: String, maxSize: Int,
                 minCount: Long = 1L): DataFrame = {
    require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")
    val counts = docs.select(explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val w = Window.orderBy(col("cnt").desc, col("term"))
    counts.withColumn("token_id", row_number().over(w).cast("long"))
      .filter(col("token_id") <= maxSize)
      .select("term", "token_id", "cnt")
  }

  /** Encode each document as its token-id sequence under a
    * [[buildVocab]] vocabulary: out-of-vocabulary tokens map to 0.
    * Returns `(doc_id, n_tokens, n_unk, ids_csv)` with the ids
    * comma-joined in document order (string-typed for engine-portable
    * comparison; split on ',' to consume).
    *
    * Scale shape: positions ride `posexplode`; the vocab join is a
    * broadcast while the vocabulary is small (AQE decides from runtime
    * size) and degrades to a shuffle join on term; reassembly is one
    * doc-keyed aggregation whose per-group state is the doc's own
    * length.
    */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 vocab: DataFrame): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    toks.join(vocab.select("term", "token_id"), Seq("term"), "left")
      .withColumn("_tid", coalesce(col("token_id"), lit(0L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_unk"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("_tid")))),
            s => s.getField("_tid").cast("string")),
          ",").as("ids_csv"))
  }

  /** Token statistics per group column. */
  def tokenStats(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.select(col(groupCol).as("grp"),
        tokenCount(col(textCol)).as("n_tok"),
        subwordCount(col(textCol)).as("n_sub"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        sum("n_sub").as("total_subwords"),
        round(avg("n_tok"), 4).as("avg_tokens"))
}
