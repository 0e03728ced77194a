package graft

import org.apache.spark.sql.functions._
import graft.Queries.QueryDef
import graft.core.Tables
import graft.ops.{Chunking, Sampling, Sketches, TextAnalysis, WebText}

/** Round-5 training-data operators behind the hash gate: C4 line-grain
  * cleanup, Gopher rule flags, context-window chunking, count-min
  * point-frequency sketch. Oracles replay the identical arithmetic in
  * DuckDB (QueriesScale's conventions: deterministic ORDER BY, rounded
  * doubles, BIGINT counts, md5-derived portable hashes).
  */
object QueriesData {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.load(spark, dir, name)

  /** C4-style line filtering ([[WebText.c4CleanDocs]]): lines are planted
    * so every rule fires somewhere — a good sentence line, a too-short
    * unpunctuated line, javascript / lorem-ipsum / cookie-policy
    * boilerplate on different doc subsets, and a short-suffix line whose
    * word count depends on the doc's length. The oracle replays the
    * predicate with a `list_filter` lambda.
    */
  val q88 = QueryDef("q88_c4_line_filter", (spark, dir) => {
    val corpus = t(spark, dir, "documents").select(col("doc_id"),
      concat_ws("\n",
        concat(substring(col("text"), 1, 100), lit(".")),
        lit("click here"),
        when(col("doc_id") % 3 === 0,
          lit("please enable javascript to view this page.")),
        when(col("doc_id") % 4 === 0,
          lit("lorem ipsum dolor sit amet consectetur adipiscing elit.")),
        concat(substring(col("text"), 101, 80),
          lit(" closing words for this paragraph!")),
        when(col("doc_id") % 5 === 0,
          lit("see our cookie policy for details on tracking."))
      ).as("text"))
    WebText.c4CleanDocs(corpus, "text")
      .select("doc_id", "n_lines", "n_kept", "clean_text")
      .orderBy("doc_id")
  }, Some(
    """WITH corpus AS (
      |  SELECT doc_id, concat_ws(chr(10),
      |    substr(text, 1, 100) || '.',
      |    'click here',
      |    CASE WHEN doc_id % 3 = 0
      |         THEN 'please enable javascript to view this page.' END,
      |    CASE WHEN doc_id % 4 = 0
      |         THEN 'lorem ipsum dolor sit amet consectetur adipiscing elit.' END,
      |    substr(text, 101, 80) || ' closing words for this paragraph!',
      |    CASE WHEN doc_id % 5 = 0
      |         THEN 'see our cookie policy for details on tracking.' END) AS text
      |  FROM documents),
      |m AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus),
      |k AS (SELECT doc_id, l, list_filter(l, x ->
      |        regexp_matches(rtrim(x), '[.!?"]$')
      |        AND len(regexp_extract_all(rtrim(x), '[^ ]+')) >= 5
      |        AND NOT contains(lower(rtrim(x)), 'lorem ipsum')
      |        AND NOT contains(lower(rtrim(x)), 'javascript')
      |        AND NOT contains(lower(rtrim(x)), 'cookie policy')) AS kept
      |      FROM m)
      |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
      |       CAST(len(kept) AS BIGINT) AS n_kept,
      |       array_to_string(kept, chr(10)) AS clean_text
      |FROM k ORDER BY doc_id""".stripMargin))

  /** Gopher rule flags ([[TextAnalysis.gopherFlags]]): the raw doc text
    * (word counts straddle the 50-word floor, so `keep` splits the
    * corpus) plus planted bullet lines, an ellipsis line, and a
    * symbol-spam line on different doc subsets.
    */
  val q89 = QueryDef("q89_gopher_rules", (spark, dir) => {
    val corpus = t(spark, dir, "documents").select(col("doc_id"),
      concat_ws("\n",
        col("text"),
        when(col("doc_id") % 4 === 0, lit("- first bullet item")),
        when(col("doc_id") % 4 === 0, lit("- second bullet item")),
        when(col("doc_id") % 5 === 0, lit("to be continued...")),
        when(col("doc_id") % 6 === 0, lit("### ### ### ### ### ### ### ###"))
      ).as("text"))
    TextAnalysis.gopherFlags(corpus, "text")
      .select(("doc_id" +: TextAnalysis.gopherCols).map(col): _*)
      .orderBy("doc_id")
  }, Some(
    """WITH corpus AS (
      |  SELECT doc_id, concat_ws(chr(10),
      |    text,
      |    CASE WHEN doc_id % 4 = 0 THEN '- first bullet item' END,
      |    CASE WHEN doc_id % 4 = 0 THEN '- second bullet item' END,
      |    CASE WHEN doc_id % 5 = 0 THEN 'to be continued...' END,
      |    CASE WHEN doc_id % 6 = 0 THEN '### ### ### ### ### ### ### ###' END
      |  ) AS text
      |  FROM documents),
      |m AS (SELECT doc_id,
      |        regexp_extract_all(text,
      |          '[^ ' || chr(9) || chr(10) || chr(12) || chr(13) || ']+') AS w,
      |        string_split(text, chr(10)) AS l
      |      FROM corpus),
      |x AS (SELECT doc_id,
      |        CAST(len(w) AS BIGINT) AS n_words,
      |        CAST(len(l) AS BIGINT) AS n_lines,
      |        CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum')
      |          AS BIGINT) AS char_sum,
      |        CAST(len(list_filter(w, t -> starts_with(t, '#')
      |          OR contains(t, '...'))) AS BIGINT) AS sym_w,
      |        CAST(len(list_filter(w, t -> regexp_matches(t, '[a-zA-Z]')))
      |          AS BIGINT) AS alpha_w,
      |        CAST(len(list_filter(l, t -> starts_with(ltrim(t), '- ')
      |          OR starts_with(ltrim(t), '* ')
      |          OR starts_with(ltrim(t), '• '))) AS BIGINT) AS bullet_l,
      |        CAST(len(list_filter(l, t -> rtrim(t) LIKE '%...'
      |          OR rtrim(t) LIKE '%…')) AS BIGINT) AS ell_l,
      |        CAST(CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END
      |           + CASE WHEN list_contains(w, 'a') THEN 1 ELSE 0 END
      |           + CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END
      |           + CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END
      |           + CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END
      |           + CASE WHEN list_contains(w, 'in') THEN 1 ELSE 0 END
      |           + CASE WHEN list_contains(w, 'is') THEN 1 ELSE 0 END
      |          AS BIGINT) AS stop_hits
      |      FROM m),
      |r AS (SELECT doc_id, n_words, n_lines,
      |        CASE WHEN n_words = 0 THEN 0.0
      |             ELSE round(char_sum / CAST(n_words AS DOUBLE), 4)
      |        END AS mean_word_len,
      |        CASE WHEN n_words = 0 THEN 0.0
      |             ELSE round(sym_w / CAST(n_words AS DOUBLE), 4)
      |        END AS symbol_ratio,
      |        CASE WHEN n_words = 0 THEN 0.0
      |             ELSE round(alpha_w / CAST(n_words AS DOUBLE), 4)
      |        END AS alpha_ratio,
      |        CASE WHEN n_lines = 0 THEN 0.0
      |             ELSE round(bullet_l / CAST(n_lines AS DOUBLE), 4)
      |        END AS bullet_frac,
      |        CASE WHEN n_lines = 0 THEN 0.0
      |             ELSE round(ell_l / CAST(n_lines AS DOUBLE), 4)
      |        END AS ellipsis_frac,
      |        stop_hits
      |      FROM x)
      |SELECT doc_id, n_words, n_lines, mean_word_len, symbol_ratio,
      |       alpha_ratio, bullet_frac, ellipsis_frac, stop_hits,
      |       (n_words >= 50 AND n_words <= 100000
      |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
      |        AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
      |        AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
      |        AND stop_hits >= 2) AS keep
      |FROM r ORDER BY doc_id""".stripMargin))

  /** Context-window chunking ([[Chunking.chunkTokens]]) at size 32 /
    * stride 24: docs over 32 tokens fan out into overlapping windows,
    * only the final window runs short. The oracle replays the window
    * arithmetic with `generate_series` + `list_slice`.
    */
  val q90 = QueryDef("q90_token_chunks", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    Chunking.chunkTokens(docs, "doc_id", "text", chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")
  }, Some(
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |n AS (SELECT doc_id, toks,
      |        CASE WHEN len(toks) <= 32 THEN 1
      |             ELSE CAST(ceil((len(toks) - 32) / 24.0) AS INT) + 1
      |        END AS nc
      |      FROM d),
      |c AS (SELECT doc_id, toks,
      |        unnest(generate_series(0, nc - 1)) AS chunk_id
      |      FROM n),
      |s AS (SELECT doc_id, chunk_id,
      |        list_slice(toks, chunk_id * 24 + 1, chunk_id * 24 + 32) AS chunk
      |      FROM c)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |       CAST(len(chunk) AS BIGINT) AS n_tokens,
      |       array_to_string(chunk, ' ') AS chunk_text
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin))

  /** Count-min sketch ([[Sketches.countMinSketch]] + [[cmsEstimate]])
    * over a deliberately narrow 4×64 table so collisions actually inflate
    * some estimates: point-frequency estimates for keys 0–49 of `user_id
    * % 200`. The oracle rebuilds the identical sketch — same md5 bucket
    * hashes, same min-over-rows — so the estimates (collisions included)
    * must match bit for bit.
    */
  val q91 = QueryDef("q91_countmin_sketch", (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select(pmod(col("user_id"), lit(200L)).as("uid"))
    val sketch = Sketches.countMinSketch(ev, "uid", depth = 4, width = 64)
    val keys = spark.range(50).select(col("id").as("uid"))
    Sketches.cmsEstimate(sketch, keys, "uid")
      .select(col("key").cast("long").as("uid"), col("est"))
      .orderBy("uid")
  }, Some(
    """WITH ev AS (SELECT user_id % 200 AS uid FROM events),
      |js AS (SELECT unnest(generate_series(0, 3)) AS j),
      |cnt AS (SELECT j,
      |          CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
      |            || CAST(uid AS VARCHAR)), 1, 15) AS BIGINT) % 64 AS bucket,
      |          CAST(count(*) AS BIGINT) AS cnt
      |        FROM ev CROSS JOIN js GROUP BY 1, 2),
      |keys AS (SELECT unnest(generate_series(0, 49)) AS uid),
      |kb AS (SELECT uid, j,
      |          CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
      |            || CAST(uid AS VARCHAR)), 1, 15) AS BIGINT) % 64 AS bucket
      |       FROM keys CROSS JOIN js)
      |SELECT kb.uid, CAST(min(coalesce(cnt.cnt, 0)) AS BIGINT) AS est
      |FROM kb LEFT JOIN cnt ON kb.j = cnt.j AND kb.bucket = cnt.bucket
      |GROUP BY kb.uid ORDER BY kb.uid""".stripMargin))

  /** Temperature mix sampling ([[Sampling.temperatureSample]]) at
    * α = 0.5 / target 0.5 over the language column: scarce languages keep
    * (rate caps at 1), dominant ones downsample, membership by the
    * portable (salt, id) hash. The oracle replays the rate formula in
    * the SAME operation order (the 6-decimal rounding before the
    * comparison absorbs cross-engine `pow` ulps).
    */
  val q93 = QueryDef("q93_temperature_mix", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "lang")
    Sampling.temperatureSample(docs, "doc_id", "lang",
        salt = "mix", alpha = 0.5, targetFrac = 0.5)
      .select("doc_id", "lang", "mix_rate")
      .orderBy("doc_id")
  }, Some(
    """WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
      |                FROM documents WHERE lang IS NOT NULL GROUP BY lang),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      |               CAST(sum(CAST(power(CAST(n AS DOUBLE), 0.5) * 1e12
      |                 AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS z
      |        FROM counts),
      |rates AS (SELECT lang,
      |            round(least(1.0,
      |              0.5 * nn * power(CAST(n AS DOUBLE), 0.5) / z / n),
      |              6) AS mix_rate
      |          FROM counts, tot)
      |SELECT doc_id, d.lang, mix_rate
      |FROM documents d JOIN rates USING (lang)
      |WHERE CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15)
      |        AS BIGINT) % 1000000 < floor(mix_rate * 1000000)
      |ORDER BY doc_id""".stripMargin))

  /** Vocabulary induction + token-id encoding
    * ([[TextAnalysis.buildVocab]] at maxSize 20 — small enough that real
    * OOV occurs — then [[TextAnalysis.encodeDocs]]): ids are dense ranks
    * by (count DESC, term ASC), OOV encodes 0, and the full id sequence
    * of every document must match byte for byte as a CSV string.
    */
  val q97 = QueryDef("q97_vocab_encode", (spark, dir) => {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", maxSize = 20)
    TextAnalysis.encodeDocs(docs, "doc_id", "text", vocab).orderBy("doc_id")
  }, Some(
    """WITH spl AS (SELECT doc_id, string_split(lower(text), ' ') AS l
      |             FROM documents),
      |tk AS (SELECT doc_id, i AS pos, l[i] AS term
      |       FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
      |             FROM spl)
      |       WHERE l[i] <> ''),
      |counts AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
      |vocab AS (SELECT term, token_id FROM (
      |            SELECT term, row_number() OVER (ORDER BY cnt DESC, term)
      |                     AS token_id
      |            FROM counts) WHERE token_id <= 20),
      |e AS (SELECT doc_id, pos, coalesce(vocab.token_id, 0) AS tid,
      |             vocab.token_id AS vid
      |      FROM tk LEFT JOIN vocab USING (term))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN vid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
      |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids_csv
      |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** BPE subword vocabulary induction + encoding ([[graft.ops.Bpe]]):
    * merges learned over the corpus (deterministic `(cnt DESC, lhs, rhs)`
    * choice), every document encoded as its piece sequence. Learning is
    * iterative (one aggregation per merge round), so — like q58's k-means
    * model — the MERGE TABLE materializes to a side path and the oracle
    * replays what encoding ADDS on top: greedy rank-ordered merge
    * application (a recursive CTE over framed symbol strings, where
    * `replace`'s left-to-right non-overlapping scan is exactly
    * [[graft.functions.BpeRuntime]]'s contract), then per-document
    * reassembly. Both engines read the same merges, and the CSV hash
    * pins every piece boundary of every document.
    */
  private val q100MergePath = QueriesScale.sidePath("q100_bpe_merges")

  val q100 = QueryDef("q100_bpe_encode", (spark, dir) => {
    QueriesScale.reapStaleSideTables("q100_bpe_merges")
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val mergeTable = graft.ops.Bpe.learn(docs, "text", numMerges = 20)
    mergeTable.write.mode("overwrite").parquet(q100MergePath)
    val merges = graft.ops.Bpe.mergesOf(spark.read.parquet(q100MergePath))
    graft.ops.Bpe.encode(docs, "doc_id", "text", merges).orderBy("doc_id")
  }, Some(
    s"""WITH RECURSIVE m AS (SELECT rank, lhs, rhs
       |           FROM read_parquet('$q100MergePath/*.parquet')),
       |nm AS (SELECT max(rank) AS top FROM m),
       |spl AS (SELECT doc_id, string_split(lower(text), ' ') AS l
       |        FROM documents),
       |tk AS (SELECT doc_id, i AS pos, l[i] AS term
       |       FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
       |             FROM spl)
       |       WHERE l[i] <> ''),
       |enc(doc_id, pos, s, step) AS (
       |  SELECT doc_id, pos,
       |    array_to_string(list_transform(string_split(term, ''),
       |      c -> chr(17) || c || chr(18)), ''), 0
       |  FROM tk
       |  UNION ALL
       |  SELECT e.doc_id, e.pos,
       |    replace(e.s, chr(17) || m.lhs || chr(18) || chr(17) || m.rhs || chr(18),
       |      chr(17) || m.lhs || m.rhs || chr(18)),
       |    e.step + 1
       |  FROM enc e JOIN m ON m.rank = e.step + 1),
       |fin AS (SELECT doc_id, pos,
       |          replace(replace(replace(s, chr(18) || chr(17), ','),
       |            chr(17), ''), chr(18), '') AS word_csv
       |        FROM enc WHERE step = (SELECT top FROM nm))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(len(string_split(word_csv, ','))) AS BIGINT) AS n_pieces,
       |  string_agg(word_csv, ',' ORDER BY pos) AS pieces_csv
       |FROM fin GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** HTML → text extraction ([[WebText.htmlToText]]): each document is
    * rendered into a full page — head/style, nav links, a script with
    * `<`/`&&` traps, a comment, entity-laden paragraphs, a conditional
    * div, an undecoded `&copy;` footer — and the extractor must recover
    * exactly the visible text. The oracle replays the identical
    * RE2-portable regexp chain in DuckDB (same pattern text; DuckDB
    * needs the explicit 'g' flag where Spark replaces globally).
    */
  val q108 = QueryDef("q108_html_extract", (spark, dir) => {
    val pages = t(spark, dir, "documents").select(col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>body { color: red; }</style></head><body>"),
        lit("<nav><a href=\"/\">Home</a> | <a href=\"/docs\">Docs</a></nav>"),
        lit("<script>var x = 1 < 2 && \"q\";</script>"),
        lit("<h1>Heading "), (col("doc_id") % 7).cast("string"), lit("</h1>"),
        lit("<!-- build "), col("doc_id").cast("string"), lit(" -->"),
        lit("<p>"), substring(col("text"), 1, 120),
        lit(" &amp; more &quot;quoted&quot;&nbsp;text</p>"),
        when(col("doc_id") % 3 === 0,
          concat(lit("<div class=\"x\">"), substring(col("text"), 121, 80),
            lit(" tail</div>"))).otherwise(lit("")),
        lit("<footer>&copy; 2026 Example</footer></body></html>")
      ).as("html"))
    WebText.extractHtmlDocs(pages, "html")
      .select("doc_id", "text", "n_chars").orderBy("doc_id")
  }, Some(
    """WITH pages AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || doc_id ||
      |    '</title><style>body { color: red; }</style></head><body>' ||
      |    '<nav><a href="/">Home</a> | <a href="/docs">Docs</a></nav>' ||
      |    '<script>var x = 1 < 2 && "q";</script>' ||
      |    '<h1>Heading ' || (doc_id % 7) || '</h1>' ||
      |    '<!-- build ' || doc_id || ' -->' ||
      |    '<p>' || substr(text, 1, 120) || ' &amp; more &quot;quoted&quot;&nbsp;text</p>' ||
      |    CASE WHEN doc_id % 3 = 0
      |         THEN '<div class="x">' || substr(text, 121, 80) || ' tail</div>'
      |         ELSE '' END ||
      |    '<footer>&copy; 2026 Example</footer></body></html>' AS html
      |  FROM documents),
      |s1 AS (SELECT doc_id, regexp_replace(html, '(?s)<!--.*?-->', '', 'g') AS s FROM pages),
      |s2 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(s,
      |         '(?is)<script\b[^>]*>.*?</script>', '', 'g'),
      |         '(?is)<style\b[^>]*>.*?</style>', '', 'g'),
      |         '(?is)<noscript\b[^>]*>.*?</noscript>', '', 'g') AS s FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(s,
      |         '(?is)</?(p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|section|article|header|footer|nav|blockquote|pre|form|hr|title)\b[^>]*/?>',
      |         chr(10), 'g') AS s FROM s2),
      |s4 AS (SELECT doc_id, regexp_replace(s, '(?s)<[^>]*>', ' ', 'g') AS s FROM s3),
      |s5 AS (SELECT doc_id,
      |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |         regexp_replace(regexp_replace(s,
      |           '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
      |           '&#39;', chr(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS s
      |       FROM s4),
      |s6 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
      |         '[ \t\r]+', ' ', 'g'), ' ?\n ?', chr(10), 'g'),
      |         '\n+', chr(10), 'g'), '^\s+|\s+$', '', 'g') AS s FROM s5)
      |SELECT doc_id, s AS text, CAST(length(s) AS BIGINT) AS n_chars
      |FROM s6 ORDER BY doc_id""".stripMargin))

  /** Host-graph PageRank ([[graft.ops.Graph.pageRank]]): a 50-host link
    * graph synthesized from documents (two hash-derived links per doc
    * plus a hub edge to h0), ranked for 5 exact-integer rounds. The
    * oracle unrolls the same 5 rounds as chained CTEs with DuckDB's `//`
    * floor division — identical to Spark's `div` for the non-negative
    * ranks — so the hash gate pins every micro-unit of every round.
    */
  val q109 = QueryDef("q109_host_pagerank", (spark, dir) => {
    val d = t(spark, dir, "documents")
    def host(e: org.apache.spark.sql.Column) = concat(lit("h"), e.cast("string"))
    val edges = d.select(host(col("doc_id") % 50).as("src"),
        host((col("doc_id") * 7 + 3) % 50).as("dst"))
      .unionByName(d.select(host(col("doc_id") % 50).as("src"),
        host((col("doc_id") * 13 + 1) % 50).as("dst")))
      .unionByName(d.filter(col("doc_id") % 50 =!= 0)
        .select(host(col("doc_id") % 50).as("src"), lit("h0").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 5)
      .orderBy(desc("rank_micro"), col("id"))
  }, Some {
    val rounds = (1 to 5).map { i =>
      s"""c$i AS (SELECT e.dst, CAST(SUM(((p${i - 1}.rank_micro * 850000) // 1000000) // e.outdeg) AS BIGINT) AS in_mass
         |        FROM e JOIN p${i - 1} ON p${i - 1}.id = e.src GROUP BY e.dst),
         |p$i AS (SELECT v.id, (SELECT base FROM k) + COALESCE(c$i.in_mass, 0) AS rank_micro
         |        FROM v LEFT JOIN c$i ON c$i.dst = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT 'h' || (doc_id % 50) AS src, 'h' || ((doc_id * 7 + 3) % 50) AS dst FROM documents
       |    UNION ALL
       |    SELECT 'h' || (doc_id % 50), 'h' || ((doc_id * 13 + 1) % 50) FROM documents
       |    UNION ALL
       |    SELECT 'h' || (doc_id % 50), 'h0' FROM documents WHERE doc_id % 50 <> 0)
       |  WHERE src <> dst),
       |v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM ed UNION ALL SELECT dst FROM ed)),
       |od AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY src),
       |e AS (SELECT ed.src, ed.dst, od.outdeg FROM ed JOIN od ON od.src = ed.src),
       |k AS (SELECT 1000000000000 // COUNT(*) AS init,
       |             (150000 * (1000000000000 // COUNT(*))) // 1000000 AS base
       |      FROM v),
       |p0 AS (SELECT id, (SELECT init FROM k) AS rank_micro FROM v),
       |$rounds
       |SELECT id, rank_micro FROM p5 ORDER BY rank_micro DESC, id""".stripMargin
  })

  /** robots.txt politeness filter ([[graft.ops.Robots.filterAllowed]]):
    * 20 synthesized domains with a decoy non-`*` group, a `/private`
    * disallow, a longer `/private/ok` allow, an empty (allow-all)
    * disallow, and a per-domain-conditional `/blog` disallow; every 5th
    * domain has NO robots row. The oracle derives the allowed set
    * INDEPENDENTLY (case analysis on the synthesized structure, not a
    * parser replay) — parser or precedence bugs on either side break the
    * hash.
    */
  val q111 = QueryDef("q111_robots_filter", (spark, dir) => {
    val d = t(spark, dir, "documents")
    val dom = col("doc_id") % 20
    val pages = d.select(col("doc_id"),
      concat(lit("https://d"), dom.cast("string"), lit(".example"),
        when(col("doc_id") % 5 === 0, lit("/"))
          .when(col("doc_id") % 5 === 1, lit("/private/page"))
          .when(col("doc_id") % 5 === 2, lit("/private/ok/page"))
          .when(col("doc_id") % 5 === 3,
            concat(lit("/blog/post"), col("doc_id").cast("string")))
          .otherwise(concat(lit("/open/"), col("doc_id").cast("string"))))
        .as("url"))
    val robots = d.select(dom.as("dm")).distinct()
      .filter(col("dm") % 5 =!= 4)
      .select(concat(lit("d"), col("dm").cast("string"), lit(".example")).as("domain"),
        concat(lit("# synthesized\nUser-agent: special\nDisallow: /\n\n" +
            "User-agent: *\nDisallow: /private\nAllow: /private/ok\nDisallow:\n"),
          when(col("dm") % 4 === 0, lit("Disallow: /blog\n")).otherwise(lit("")))
          .as("robots_txt"))
    graft.ops.Robots.filterAllowed(pages, robots).orderBy("doc_id")
  }, Some(
    """WITH pages AS (
      |  SELECT doc_id, doc_id % 20 AS dom, doc_id % 5 AS pc,
      |    'https://d' || (doc_id % 20) || '.example' ||
      |    CASE doc_id % 5
      |      WHEN 0 THEN '/'
      |      WHEN 1 THEN '/private/page'
      |      WHEN 2 THEN '/private/ok/page'
      |      WHEN 3 THEN '/blog/post' || doc_id
      |      ELSE '/open/' || doc_id END AS url
      |  FROM documents)
      |SELECT doc_id, url FROM pages
      |WHERE dom % 5 = 4
      |   OR pc IN (0, 2, 4)
      |   OR (pc = 3 AND dom % 4 <> 0)
      |ORDER BY doc_id""".stripMargin))

  /** Raw-crawl curation END-TO-END from `conf/crawl_pipeline.yml`: a
    * fixture WARC shard (HTML pages with nav/script boilerplate, URLs
    * across robots path classes, every 9th doc duplicated under a new
    * id) is written to disk, then the manifest chain — warc read +
    * `length_ok` gate → robots filter → HTML extract → C4 line cleanup →
    * exact keep-first dedup — runs purely from YAML. The oracle rederives
    * each stage independently: robots by case analysis (q111's
    * derivation), extraction+C4 reduced to the one surviving sentence
    * line, dedup via the q24 fingerprint window.
    */
  val q112 = QueryDef("q112_crawl_pipeline", (spark, dir) => {
    val out = graft.Queries.tmpDir("graft_q112")
    val d = t(spark, dir, "documents")
    val corpus = d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 500000).as("doc_id"), col("text")))
    val dom = col("doc_id") % 20
    val idStr = col("doc_id").cast("string")
    val url = concat(lit("https://d"), dom.cast("string"), lit(".example"),
      when(col("doc_id") % 4 === 0, concat(lit("/doc/"), idStr))
        .when(col("doc_id") % 4 === 1, concat(lit("/private/doc"), idStr))
        .when(col("doc_id") % 4 === 2, concat(lit("/private/ok/doc"), idStr))
        .otherwise(concat(lit("/blog/doc"), idStr)))
    val html = concat(
      lit("<html><body><nav><a href=\"/\">Home</a></nav>" +
        "<script>var x = 1 < 2;</script><p>"),
      col("text"), lit(".</p><p>click here</p></body></html>"))
    val recs = corpus.select(lit("response").as("warc_type"),
      url.as("target_uri"),
      concat(lit("<urn:doc:"), idStr, lit(">")).as("record_id"),
      lit("2026-01-01T00:00:00Z").as("warc_date"), html.as("payload"))
    graft.sources.Warc.write(recs, graft.sources.Warc.WarcCols(), s"$out/shard")
    val loaded = graft.core.model.Manifest.loadFile("conf/crawl_pipeline.yml",
      Seq("dev"), Map("warc_in" -> s"$out/shard", "data" -> dir))
    graft.engine.Flow.runPipeline(spark, loaded.jobs, "final_corpus",
      save = false)("final_corpus").orderBy("doc_id")
  }, Some(
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 500000, text FROM documents WHERE doc_id % 9 = 0),
      |pages AS (
      |  SELECT doc_id, doc_id % 20 AS dom, doc_id % 4 AS pc, text,
      |    'https://d' || (doc_id % 20) || '.example' ||
      |    CASE doc_id % 4
      |      WHEN 0 THEN '/doc/' || doc_id
      |      WHEN 1 THEN '/private/doc' || doc_id
      |      WHEN 2 THEN '/private/ok/doc' || doc_id
      |      ELSE '/blog/doc' || doc_id END AS url
      |  FROM corpus),
      |allowed AS (
      |  SELECT doc_id, url, text FROM pages
      |  WHERE dom % 5 = 4 OR pc IN (0, 2) OR (pc = 3 AND dom % 4 <> 0)),
      |lines AS (
      |  SELECT doc_id, url,
      |    trim(regexp_replace(text, '[ \t\r]+', ' ', 'g')) || '.' AS line
      |  FROM allowed),
      |kept AS (
      |  SELECT doc_id, url, line AS text FROM lines
      |  WHERE len(regexp_extract_all(line, '[^ ]+')) >= 3
      |    AND NOT contains(lower(line), 'lorem ipsum')
      |    AND NOT contains(lower(line), 'javascript')
      |    AND NOT contains(lower(line), 'cookie policy')),
      |fp AS (
      |  SELECT doc_id, url, text,
      |    row_number() OVER (
      |      PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
      |      ORDER BY doc_id) AS rn
      |  FROM kept)
      |SELECT doc_id, url, text FROM fp WHERE rn = 1 ORDER BY doc_id""".stripMargin))

  /** URL canonicalization ([[WebText.canonicalizeUrl]]): URLs synthesized
    * from doc_id exercise every rule — uppercase scheme/host (lowercased),
    * `:80` on http (stripped) vs `:8080` (kept), empty path (→ `/`) with
    * path CASE PRESERVED, tracking params dropped, the rest sorted, and a
    * fragment dropped. The oracle derives each canonical form by
    * INDEPENDENT case analysis on the synthesis arithmetic (q111's
    * pattern), not by replaying the parser — so a rule misfiring on either
    * side breaks the hash.
    */
  val q117 = QueryDef("q117_url_canonicalize", (spark, dir) => {
    val id = col("doc_id")
    val url = concat(
      lit("HTTP://Example"), (id % 7).cast("string"), lit(".COM"),
      when(id % 4 === 0, lit(":80"))
        .when(id % 4 === 1, lit(":8080")).otherwise(lit("")),
      when(id % 3 === 0, lit(""))
        .otherwise(concat(lit("/Path/"), (id % 5).cast("string"))),
      when(id % 6 === 0, lit("?utm_source=feed&b=2&a=1"))
        .when(id % 6 === 1, lit("?b=2&a=1"))
        .when(id % 6 === 2, lit("?a=1&b=2&fbclid=xyz"))
        .when(id % 6 === 3, lit("?gclid=1"))
        .otherwise(lit("")),
      when(id % 2 === 0, lit("#Frag")).otherwise(lit("")))
    t(spark, dir, "documents")
      .select(WebText.canonicalizeUrl(url).as("canonical"))
      .groupBy("canonical").agg(count(lit(1)).as("n"))
      .orderBy("canonical")
  }, Some(
    """WITH c AS (
      |  SELECT 'http://example' || (doc_id % 7) || '.com' ||
      |    CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END ||
      |    CASE WHEN doc_id % 3 = 0 THEN '/'
      |         ELSE '/Path/' || (doc_id % 5) END ||
      |    CASE WHEN doc_id % 6 IN (0, 1, 2) THEN '?a=1&b=2' ELSE '' END
      |    AS canonical
      |  FROM documents)
      |SELECT canonical, CAST(count(*) AS BIGINT) AS n FROM c
      |GROUP BY canonical ORDER BY canonical""".stripMargin))

  val all: Seq[QueryDef] = Seq(q88, q89, q90, q91, q93, q97, q100, q108,
    q109, q111, q112, q117)
}
