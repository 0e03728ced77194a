package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pixel-grain perceptual hash ([[AHash64]]): planted-pixel replay,
  * byte-fallback equality with the byte-grain op, expression-vs-
  * mapPartitions bit-equality, and the re-encoding case byte-grain
  * hashing exists to lose.
  */
class AHash64Spec extends SparkSpec {
  import spark.implicits._

  /** Closed-form reference of the 8×8 mean-luma hash over planted
    * values — independent arithmetic (no shared code with the
    * expression beyond the spec'd contract).
    */
  private def plantedHash(w: Int, h: Int, v: (Int, Int) => Int): Long = {
    val cs = new Array[Long](64); val cc = new Array[Long](64)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val c = (y * 8 / h) * 8 + x * 8 / w
      cs(c) += v(x, y); cc(c) += 1; total += v(x, y)
    }
    (0 until 63).foldLeft(0L)((acc, c) =>
      if (cc(c) > 0 && cs(c) * (w.toLong * h) > total * cc(c))
        acc | (1L << c)
      else acc)
  }

  private def pix(id: Long)(x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 251).toInt

  test("decoded PNG hash replays the planted pixel values exactly") {
    for (id <- Seq(0L, 1L, 7L, 42L, 1234L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val png = graft.ops.Multimodal.grayPng(w, h, pix(id))
      assert(AHash64.compute(png) === plantedHash(w, h, pix(id)),
        s"id=$id dims=${w}x$h")
    }
    // non-negative by construction (bit 63 clear)
    assert(AHash64.compute(graft.ops.Multimodal.grayPng(8, 8,
      (_, _) => 255)) >= 0L)
  }

  test("undecodable payloads fall back bit-identically to the byte-grain " +
    "aHash op") {
    val blobs = Seq("not an image at all".getBytes("UTF-8"),
      Array[Byte](1, 2, 3), Array.tabulate(4096)(i => (i * 37 % 251).toByte),
      // truncated PNG: magic ok, body gone — ImageIO decode fails
      graft.ops.Multimodal.grayPng(16, 16, pix(3)).take(20))
    val df = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("doc_id", "payload")
    val viaExpr = graft.ops.Multimodal.aHashPixel(df, "doc_id", "payload")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(2))
    val viaByteOp = graft.ops.Multimodal.aHash(df, "doc_id", "payload")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(viaExpr.toSeq === viaByteOp.toSeq)
  }

  test("expression output is bit-identical to a mapPartitions port over " +
    "mixed payloads") {
    val rows: Seq[(Long, Array[Byte])] = (0L until 40L).map { id =>
      if (id % 3 == 0) (id, s"corrupt payload $id".getBytes("UTF-8"))
      else (id, graft.ops.Multimodal.grayPng(
        (8 + id % 9).toInt, (8 + id % 7).toInt, pix(id)))
    }
    val df = rows.toDF("doc_id", "payload")
    val expr = graft.ops.Multimodal.aHashPixel(df, "doc_id", "payload")
      .select("doc_id", "simhash").as[(Long, Long)].collect().sorted.toSeq
    val ported = df.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => (id, AHash64.compute(b)) })
      .collect().sorted.toSeq
    assert(expr === ported)
  }

  test("re-encoding the same pixels (gray PNG vs RGB BMP) keeps the pixel " +
    "hash and breaks the byte hash") {
    val w = 15; val h = 11
    val png = graft.ops.Multimodal.grayPng(w, h, pix(9))
    // same planted values as 24-bit RGB (r=g=b=v → BT.601 luma == v)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w; b <- 0 until 3)
      img.getRaster.setSample(x, y, b, pix(9)(x, y))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", out))
    val bmp = out.toByteArray
    assert(AHash64.compute(png) === AHash64.compute(bmp),
      "pixel hash must survive re-encoding")
    assert(AHash64.compute(png) === plantedHash(w, h, pix(9)))
    assert(AHash64.byteHash(png, 63) !== AHash64.byteHash(bmp, 63),
      "the byte-grain hash loses exactly this case")
  }

  test("ahash64 registers as a SQL function") {
    val df = Seq((1L, graft.ops.Multimodal.grayPng(8, 8, pix(1))))
      .toDF("doc_id", "payload")
    df.createOrReplaceTempView("ahash_t")
    val viaSql = spark.sql("SELECT ahash64(payload) AS h FROM ahash_t")
      .head().getLong(0)
    assert(viaSql === plantedHash(8, 8, pix(1)))
  }
}
