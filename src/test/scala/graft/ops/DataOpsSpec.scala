package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 data-pipeline operators: C4 line cleanup, Gopher rule flags,
  * context-window chunking, count-min sketch. Fixtures pin the rule
  * semantics; the randomized checks hold the distributed plans to plain
  * driver-side reference implementations (the q75/q77 cross-check
  * pattern).
  */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  test("c4CleanDocs keeps sentence lines, drops short/blocklisted ones") {
    val docs = Seq(
      (1L, "this line has enough words to keep.\nclick here\nwe use javascript heavily here today.\nanother good sentence line right here!"),
      (2L, "short.\nall of these lines drop\nno terminal punct here at all")
    ).toDF("doc_id", "text")
    val out = WebText.c4CleanDocs(docs, "text")
      .select("doc_id", "n_lines", "n_kept", "clean_text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 4L, 2L,
      "this line has enough words to keep.\nanother good sentence line right here!")))
    // doc 2: every line fails (2 words / no punct / no punct) but the doc
    // row itself survives with n_kept = 0 — the caller owns doc policy
    assert(out(1) == ((2L, 3L, 0L, "")))
  }

  test("gopherFlags metrics and keep conjunction") {
    val good = (1 to 20).map(_ => "the quick brown fox jumps in a box").mkString(" ")
    val docs = Seq(
      (1L, good),                                   // 150 words, all rules pass
      (2L, "the a of and to in is"),                // 7 words -> too short
      (3L, good + "\n- b one\n- b two\n- b three"), // bullets but under 0.9 frac
      (4L, ("xx " * 60).trim)                       // no stopwords, mean len 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherFlags(docs, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_words") == 160L)
    assert(out(0).getAs[Boolean]("keep"))
    assert(!out(1).getAs[Boolean]("keep"))          // word floor
    assert(out(2).getAs[Double]("bullet_frac") == 0.75)
    assert(out(2).getAs[Boolean]("keep"))
    assert(!out(3).getAs[Boolean]("keep"))          // stopwords + mean len
    assert(out(3).getAs[Double]("mean_word_len") == 2.0)
    assert(out(3).getAs[Long]("stop_hits") == 0L)
  }

  test("chunkTokens matches a driver-side reference across lengths") {
    val cs = 8; val st = 5
    val docs = (1 to 40).map(n => (n.toLong,
      (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, "doc_id", "text", cs, st)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect()
    val want = (1 to 40).flatMap { n =>
      val toks = (1 to n).map(i => s"t$i")
      val nc = if (n <= cs) 1 else math.ceil((n - cs).toDouble / st).toInt + 1
      (0 until nc).map { c =>
        val chunk = toks.slice(c * st, c * st + cs)
        (n.toLong, c.toLong, chunk.size.toLong, chunk.mkString(" "))
      }
    }
    assert(got.toSeq == want)
    // every token covered; only the final chunk may run short
    assert(got.groupBy(_._1).forall { case (_, cs0) =>
      cs0.init.forall(_._3 == cs) })
  }

  test("temperatureSample matches a driver-side reference; scarce groups cap at 1") {
    val rows = (1 to 900).map(i => (i.toLong,
      if (i <= 600) "big" else if (i <= 850) "mid" else "small"))
    val out = Sampling.temperatureSample(rows.toDF("id", "grp"), "id", "grp",
      salt = "s1", alpha = 0.5, targetFrac = 0.5)
    val kept = out.select("id").as[Long].collect().toSet
    // plain-Scala replay of the contract: md5 bucket + rounded rate
    val counts = rows.groupBy(_._2).map { case (g, r) => g -> r.size.toLong }
    val n = rows.size.toLong
    // Z sums 1e-12-quantized terms exactly, mirroring the decimal
    // accumulator (order-independent by construction)
    val z = counts.values.map(c =>
        BigDecimal.valueOf(math.pow(c.toDouble, 0.5) * 1e12)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / 1e12
    def rate(g: String): Double = {
      val c = counts(g)
      val raw = math.min(1.0, 0.5 * n * math.pow(c.toDouble, 0.5) / z / c)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1$id".getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000000L
    }
    val expect = rows.collect { case (id, g)
      if bucket(id) < math.floor(rate(g) * 1000000).toLong => id }.toSet
    assert(kept == expect)
    // alpha < 1 upweights the scarce group past targetFrac — capped at
    // rate 1.0, i.e. kept whole, never duplicated
    assert(rate("small") == 1.0)
    assert(out.filter(col("grp") === "small").count() == 50L)
    assert(out.count() < 900L)
  }

  test("buildVocab ranks by (count desc, term); encodeDocs maps OOV to 0") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b rare")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", maxSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // b:4 -> 1, a:3 -> 2, c/rare tie at 1 -> 'c' wins alphabetically -> 3
    assert(vocab == Map("b" -> 1L, "a" -> 2L, "c" -> 3L))
    val enc = TextAnalysis.encodeDocs(docs, "doc_id", "text",
        TextAnalysis.buildVocab(docs, "text", maxSize = 3))
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(enc(0) == ((1L, 6L, 0L, "1,1,1,2,2,3")))
    assert(enc(1) == ((2L, 3L, 1L, "2,1,0"))) // 'rare' is OOV -> 0
    // the YAML wrapper self-trains and encodes in one transform
    val viaJob = new graft.jobs.VocabEncodeJob().transform(
      Map("d" -> docs), spark, Map("vocab_size" -> "3"))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(viaJob.toSeq == enc.toSeq)
  }

  test("packedText concatenates each bin's docs in id order with the separator") {
    val docs = Seq((3L, "cc", 2L), (1L, "aa", 2L), (2L, "bb", 2L),
      (4L, "dd", 2L), (5L, "ee", 2L)).toDF("id", "text", "n_tok")
    // one shard, budget 4 -> bins of two docs in id order
    val out = Sampling.packedText(docs, "id", "text", "n_tok", budget = 4L,
        shards = 1, salt = "x")
      .orderBy("bin").collect()
    assert(out.map(_.getAs[String]("packed_text")).toSeq ==
      Seq("aa<eos>bb", "cc<eos>dd", "ee"))
    assert(out.map(_.getAs[Long]("n_docs")).toSeq == Seq(2L, 2L, 1L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 2L))
  }

  test("countMin estimates: upper bound, exact without collisions, zero for absent") {
    val n = 2000
    val vals = (1 to n).map(i => (i % 37).toString)
    val df = vals.toDF("v")
    val exact = vals.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    // wide sketch: 37 keys in 4x1024 — collisions vanishingly unlikely
    val wide = Sketches.countMinSketch(df, "v", depth = 4, width = 1024)
    val keys = (0 until 37).map(_.toString).toDF("v")
    val estWide = Sketches.cmsEstimate(wide, keys, "v")
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) => assert(estWide(k) == c, s"key $k") }
    // narrow sketch: still an upper bound on every key
    val narrow = Sketches.countMinSketch(df, "v", depth = 4, width = 16)
    val estNarrow = Sketches.cmsEstimate(narrow, keys, "v")
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) => assert(estNarrow(k) >= c, s"key $k") }
    // absent key estimates 0 on the wide sketch
    val absent = Sketches.cmsEstimate(wide, Seq("999").toDF("v"), "v")
      .as[(String, Long)].collect().head
    assert(absent == (("999", 0L)))
    // sketch table never exceeds depth x width rows
    assert(narrow.table.count() <= 4L * 16)
  }
}

/** HTML → visible-text extraction: tag stripping, dropped blocks, entity
  * decoding, and whitespace normalization, each pinned on a hand fixture.
  */
class HtmlToTextSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(WebText.htmlToText(col("h"))).as[String].head()

  test("full page: scripts/styles/comments drop, blocks break lines, entities decode") {
    val html =
      """<html><head><title>Page One</title>
        |<style>body { color: red; }</style></head>
        |<body><nav><a href="/">Home</a> | <a href="/about">About</a></nav>
        |<script type="text/javascript">var x = 1 < 2 && "foo";</script>
        |<h1>Big   Title</h1>
        |<!-- hidden comment with words -->
        |<p>Tom &amp; Jerry say &quot;hi&quot; &lt;loudly&gt;.</p>
        |<div class="c">second&nbsp;block</div>
        |<footer>&copy; 2026</footer></body></html>""".stripMargin
    val out = extract(html)
    assert(out ==
      "Page One\nHome | About\nBig Title\nTom & Jerry say \"hi\" <loudly>.\nsecond block\n© 2026"
        .replace("© 2026", "&copy; 2026"),
      s"got:\n$out")
    assert(!out.contains("color"), "style content must drop")
    assert(!out.contains("var x"), "script content must drop")
    assert(!out.contains("hidden comment"))
  }

  test("&amp;lt; decodes to &lt; — amp is decoded last") {
    assert(extract("<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(extract("<p>a &lt; b</p>") == "a < b")
  }

  test("self-closing and attribute-laden block tags still break lines") {
    assert(extract("one<br/>two<br />three") == "one\ntwo\nthree")
    assert(extract("""<p id="x" data-y="<">alpha</p><p>beta</p>""") == "alpha\nbeta")
  }

  test("extractHtmlDocs appends text and n_chars; plain text passes through") {
    val docs = Seq((1L, "<p>ab cd</p>"), (2L, "no tags at all")).toDF("doc_id", "html")
    val out = WebText.extractHtmlDocs(docs, "html")
      .select("doc_id", "text", "n_chars").orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    assert(out(0) == ((1L, "ab cd", 5L)))
    assert(out(1) == ((2L, "no tags at all", 14L)))
  }
}
