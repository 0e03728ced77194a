package graft.sources

import graft.SparkSpec
import graft.core.io.Reader
import graft.core.model.DatasetSpec
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._

/** HTTP extraction against a loopback fixture server (zero-egress
  * environment): gzip CSV fetch (the reference's ex0 wikimedia pull),
  * plain CSV, error propagation, and Link-header pagination (github_utils
  * pattern).
  */
class HttpSpec extends SparkSpec {

  private var server: HttpServer = _
  private var base: String = _

  private val csvText = "id,name,val\n1,a,10\n2,b,20\n3,c,30\n"

  private def gzip(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(code, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
    server.createContext("/data.csv.gz",
      (ex: HttpExchange) => respond(ex, 200, gzip(csvText)))
    server.createContext("/data.csv",
      (ex: HttpExchange) => respond(ex, 200, csvText.getBytes("UTF-8")))
    server.createContext("/missing",
      (ex: HttpExchange) => respond(ex, 404, "gone".getBytes("UTF-8")))
    server.createContext("/lines.json", (ex: HttpExchange) => respond(ex, 200,
      "{\"a\": 1}\n{\"a\": 2}\n{\"a\": 3}\n".getBytes("UTF-8")))
    server.createContext("/array.json", (ex: HttpExchange) => respond(ex, 200,
      "[{\"a\": 1}, {\"a\": 2}]".getBytes("UTF-8")))
    server.createContext("/pretty.json", (ex: HttpExchange) => respond(ex, 200,
      "{\n  \"a\": 1,\n  \"b\": 2\n}\n".getBytes("UTF-8")))
    server.createContext("/api", (ex: HttpExchange) => {
      val page = Option(ex.getRequestURI.getQuery)
        .flatMap(_.split("&").find(_.startsWith("page=")))
        .map(_.stripPrefix("page=").toInt).getOrElse(1)
      val body = s"""[{"page": $page, "id": ${page * 10}}]""".getBytes("UTF-8")
      val link =
        if (page < 3) Map("Link" -> s"""<$base/api?page=${page + 1}>; rel="next"""")
        else Map.empty[String, String]
      respond(ex, 200, body, link)
    })
    server.start()
  }

  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  test("gzip CSV extraction lands as a string-typed frame (ex0 pattern)") {
    val df = Reader.read(spark,
      DatasetSpec(path = s"$base/data.csv.gz", format = "http_csv"))
    assert(df.columns.toSeq == Seq("id", "name", "val"))
    assert(df.count() == 3)
    assert(df.agg(sum(col("val").cast("long"))).head().getLong(0) == 60L)
  }

  test("plain CSV extraction works without compression") {
    val df = Http.readCsv(spark, s"$base/data.csv")
    assert(df.count() == 3)
  }

  test("non-2xx fails loudly instead of returning an empty frame") {
    val e = intercept[IllegalArgumentException] {
      Http.readCsv(spark, s"$base/missing")
    }
    assert(e.getMessage.contains("404"))
  }

  test("Link-header pagination walks all pages into one frame") {
    val df = Reader.read(spark,
      DatasetSpec(path = s"$base/api?page=1", format = "http_paginated"))
    val rows = df.orderBy("page").collect()
    assert(rows.map(_.getAs[Long]("page")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(10L, 20L, 30L))
  }

  test("maxPages truncation FAILS loudly instead of looking complete") {
    val e = intercept[IllegalArgumentException] {
      Http.pullAllPages(s"$base/api?page=1", maxPages = 2)
    }
    assert(e.getMessage.contains("INCOMPLETE"))
    // exactly at the page count, the walk completes cleanly
    assert(Http.pullAllPages(s"$base/api?page=1", maxPages = 3).length == 3)
  }

  test("readJson sniffs layout: JSONL keeps every line, arrays parse whole-file") {
    assert(Http.readJson(spark, s"$base/lines.json").count() == 3)
    assert(Http.readJson(spark, s"$base/array.json").count() == 2)
    // a pretty-printed single object is one row, not _corrupt_record lines
    val pretty = Http.readJson(spark, s"$base/pretty.json")
    assert(pretty.count() == 1 && pretty.columns.toSeq == Seq("a", "b"))
  }

  test("nextLink survives commas in URLs and malformed link-values") {
    def resp(link: String) = Http.Response(200, Array.emptyByteArray,
      Map("link" -> Seq(link)))
    assert(Http.nextLink(resp(
      s"""<$base/items?ids=1,2,3&page=2>; rel="next"""")) ==
      Some(s"$base/items?ids=1,2,3&page=2"))
    assert(Http.nextLink(resp(
      s"""<$base/a?x=1,2>; rel="prev", <$base/b?y=3,4>; rel="next"""")) ==
      Some(s"$base/b?y=3,4"))
    assert(Http.nextLink(resp("""garbage; rel="next"""")).isEmpty)
    assert(Http.nextLink(resp("")).isEmpty)
  }
}
