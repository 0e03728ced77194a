package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPInputStream

/** HTTP/API extraction source (SURVEY S11; reference
  * jobs/examples/ex0_extraction_job.py:9-16 — GET a gzip CSV into a frame —
  * and jobs/marketing/github_utils.py:7-32 — paginated REST following
  * RFC 5988 `Link: rel="next"` headers).
  *
  * Extraction is deliberately driver-side: at the moment of extraction the
  * payload is API-sized, and the distributed part of the pipeline starts
  * after the bytes land (temp file → `spark.read`, which at production
  * scale is "land to object storage, then scan"). Gzip is handled by magic
  * bytes (1f 8b) or an explicit `compression=gzip`, mirroring the
  * reference's `pd.read_csv(..., compression='gzip')`.
  */
object Http {

  /** A stalled endpoint must fail the run, not wedge it: connect and
    * whole-request timeouts bound every fetch (`maxPages` bounds count,
    * these bound time).
    */
  val connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(30)
  val requestTimeout: java.time.Duration = java.time.Duration.ofMinutes(5)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL) // reference: allow_redirects=True
    .connectTimeout(connectTimeout)
    .build()

  final case class Response(status: Int, body: Array[Byte],
                            headers: Map[String, Seq[String]]) {
    def header(name: String): Seq[String] =
      headers.getOrElse(name.toLowerCase, Nil)
  }

  def get(url: String, headers: Map[String, String] = Map.empty): Response = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET().timeout(requestTimeout)
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    Response(resp.statusCode(), resp.body(),
      scala.jdk.CollectionConverters.MapHasAsScala(resp.headers().map()).asScala
        .map { case (k, v) =>
          k.toLowerCase -> scala.jdk.CollectionConverters.ListHasAsScala(v).asScala.toSeq
        }.toMap)
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1f && (bytes(1) & 0xFF) == 0x8b

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** GET `url` to a local temp file, gunzipping when the payload is gzip
    * (magic bytes, `Content-Encoding: gzip`, or forced via `compression`).
    * Non-2xx fails loudly — a silent empty extraction poisons downstream
    * increments.
    */
  def fetchToFile(url: String, headers: Map[String, String] = Map.empty,
                  compression: Option[String] = None): Path = {
    val resp = get(url, headers)
    require(resp.status >= 200 && resp.status < 300,
      s"GET $url returned HTTP ${resp.status}")
    val encodedGzip = resp.header("content-encoding").exists(_.contains("gzip"))
    val body =
      if (compression.contains("gzip") || encodedGzip || isGzip(resp.body))
        gunzip(resp.body)
      else resp.body
    val f = Files.createTempFile("graft_http", ".dat")
    f.toFile.deleteOnExit()
    Files.write(f, body)
    f
  }

  /** GET + parse as CSV (header row, string columns — the engine's CSV
    * semantics; `options` pass through to the reader, e.g. inferSchema).
    */
  def readCsv(spark: SparkSession, url: String,
              headers: Map[String, String] = Map.empty,
              options: Map[String, String] = Map.empty): DataFrame = {
    val f = fetchToFile(url, headers, options.get("compression"))
    spark.read.option("header", "true")
      .options(options - "compression").csv(f.toString)
  }

  /** GET + parse as JSON. Layout is sniffed from the landed bytes —
    * each of the three common REST shapes parses correctly:
    *  - starts with `[`            → whole-file array (multiLine);
    *  - first line is a complete
    *    document (ends with `}`)   → JSON-lines (a multiLine default
    *    would silently keep only the FIRST document);
    *  - anything else (e.g. a pretty-printed single object whose first
    *    line is just `{`)          → whole-file (multiLine).
    * Explicit `multiLine` in `options` overrides the sniff.
    */
  def readJson(spark: SparkSession, url: String,
               headers: Map[String, String] = Map.empty,
               options: Map[String, String] = Map.empty): DataFrame = {
    val f = fetchToFile(url, headers, options.get("compression"))
    val firstLine = {
      val in = Files.newBufferedReader(f)
      try Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(_.trim).find(_.nonEmpty).getOrElse("")
      finally in.close()
    }
    val multiLine = firstLine.startsWith("[") || !firstLine.endsWith("}")
    spark.read.option("multiLine", multiLine.toString)
      .options(options - "compression").json(f.toString)
  }

  /** Follow RFC 5988 pagination: GET `url`, then keep following the
    * `Link: <...>; rel="next"` header (the reference's
    * `resp.links['next']`), collecting raw page bodies. `maxPages` bounds
    * the walk — the reference loops unbounded, which is a footgun against
    * a misbehaving API. Hitting the bound with a `next` link still
    * pending FAILS (same reasoning as the non-2xx require below): a
    * silently truncated extraction looks complete and poisons every
    * downstream increment built on it. A caller that truly wants a
    * prefix passes a larger `maxPages` or walks manually with [[get]].
    */
  def pullAllPages(url: String, headers: Map[String, String] = Map.empty,
                   maxPages: Int = 1000): Seq[Array[Byte]] = {
    val pages = Seq.newBuilder[Array[Byte]]
    var next: Option[String] = Some(url)
    var n = 0
    while (next.isDefined && n < maxPages) {
      val resp = get(next.get, headers)
      require(resp.status >= 200 && resp.status < 300,
        s"GET ${next.get} returned HTTP ${resp.status}")
      pages += resp.body
      next = nextLink(resp)
      n += 1
    }
    require(next.isEmpty, s"pagination truncated: $url still had a next " +
      s"link after maxPages=$maxPages pages — the extraction is INCOMPLETE; " +
      "raise maxPages (or fix the API's cursor loop)")
    pages.result()
  }

  /** Parse `Link: <url>; rel="next"` out of a response. Link-values split
    * on commas followed by `<` — `<` can never occur inside a URL
    * (RFC 3986), so commas WITHIN a URL survive; malformed values
    * (missing angle brackets) are skipped, not crashed on.
    */
  private[sources] def nextLink(resp: Response): Option[String] =
    resp.header("link").flatMap(_.split(",(?=\\s*<)")).flatMap { l =>
      if (!l.contains("rel=\"next\"")) None
      else {
        val s = l.indexOf('<')
        val e = l.indexOf('>', s + 1)
        if (s < 0 || e < 0) None else Some(l.substring(s + 1, e))
      }
    }.headOption

  /** Paginated REST → DataFrame: each page body is a JSON array of
    * records; pages concatenate into one frame (the reference's
    * `pages_data.extend(data)` → DataFrame).
    */
  def readPaginatedJson(spark: SparkSession, url: String,
                        headers: Map[String, String] = Map.empty,
                        maxPages: Int = 1000): DataFrame = {
    val f = Files.createTempDirectory("graft_http_pages")
    f.toFile.deleteOnExit()
    pullAllPages(url, headers, maxPages).zipWithIndex.foreach { case (body, i) =>
      Files.write(f.resolve(s"page_$i.json"), body)
    }
    spark.read.option("multiLine", "true").json(f.toString)
  }
}
