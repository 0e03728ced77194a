package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns;
  * decode / feature-extract / frame-sample run partition-local (a real
  * codec cannot be a Catalyst expression), binary in → typed rows out, no
  * shuffle. The container format here is a deterministic stand-in (fixed
  * `frameSize`-byte frames), but the Spark shape — schema, partitioning,
  * per-frame row explosion, batch iteration — is exactly what a real
  * ffmpeg/PIL-style decoder plugs into.
  */
object Multimodal {

  /** Sample every `every`-th frame of each payload: one output row per
    * sampled frame (doc_id, frame_idx, n_bytes, frame_md5). Row count
    * multiplies by frames-per-doc / every — the operator stays
    * partition-local, so the explosion never shuffles; downstream
    * aggregation decides the next exchange.
    */
  def sampleFrames(docs: DataFrame, idCol: String, payloadCol: String,
                   frameSize: Int = 64, every: Int = 4): DataFrame = {
    require(frameSize > 0 && every > 0, "frameSize and every must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // null payloads would NPE in the decoder and a null id silently
    // decodes to 0 through the tuple encoder — exclude both up front
    // (a row with no media or no identity has no frames to sample)
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .filter(col(idCol).isNotNull && col(payloadCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val nFrames = (bytes.length.toLong + frameSize - 1) / frameSize
          (0L until nFrames).iterator.filter(_ % every == 0).map { i =>
            val from = (i * frameSize).toInt
            val until = math.min(bytes.length, from + frameSize)
            md.reset()
            val hex = md.digest(java.util.Arrays.copyOfRange(bytes, from, until))
              .map("%02x".format(_)).mkString
            (id, i, (until - from).toLong, hex)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_bytes", "frame_md5")
  }

  /** Image-header metadata over an opaque binary payload — the
    * codec-free half of the multimodal seam: PNG/JPEG/GIF publish their
    * dimensions in the container header, so format + width/height (and
    * the derived aspect/megapixel filters every image-curation recipe
    * starts with) are pure column work via the codegen'd
    * [[graft.functions.ImageMeta]] expression: one byte-scan per row,
    * no shuffle, no decode library, NULL format for unrecognized or
    * truncated payloads (corrupt media is filterable data, never a
    * throw).
    *
    * Output: input row + `(format, width, height)`; format is
    * `png`/`jpeg`/`gif` or null.
    */
  def imageMeta(docs: DataFrame, payloadCol: String): DataFrame = {
    val m = graft.functions.NativeFunctions.imageMeta(col(payloadCol))
    docs.withColumn("_m", m)
      .withColumn("format",
        when(element_at(col("_m"), 1) === 0, "png")
          .when(element_at(col("_m"), 1) === 1, "jpeg")
          .when(element_at(col("_m"), 1) === 2, "gif"))
      .withColumn("width", element_at(col("_m"), 2))
      .withColumn("height", element_at(col("_m"), 3))
      .drop("_m")
  }

  /** Audio/video-header metadata — [[imageMeta]]'s time-media sibling
    * over the codegen'd [[graft.functions.MediaMeta]] scan: WAV
    * channels / sample rate and exact container duration; MP4
    * `moov/mvhd` duration. Same contract: one byte-scan per row, no
    * codec, NULL format for unrecognized payloads.
    *
    * Output: input row + `(format, channels, sample_rate,
    * duration_ms)`; channels/sample_rate are null for mp4.
    */
  def mediaMeta(docs: DataFrame, payloadCol: String): DataFrame = {
    val m = graft.functions.NativeFunctions.mediaMeta(col(payloadCol))
    docs.withColumn("_m", m)
      .withColumn("format",
        when(element_at(col("_m"), 1) === 0, "wav")
          .when(element_at(col("_m"), 1) === 1, "mp4"))
      .withColumn("channels",
        when(element_at(col("_m"), 2) >= 0, element_at(col("_m"), 2)))
      .withColumn("sample_rate",
        when(element_at(col("_m"), 3) >= 0, element_at(col("_m"), 3)))
      .withColumn("duration_ms", element_at(col("_m"), 4))
      .drop("_m")
  }

  /** Feature extraction over the binary payload: split the byte stream
    * into `dim` equal blocks and emit each block's mean byte value as a
    * `dim`-length double vector — the partition-local binary→vector seam
    * a real image/audio featurizer (CLIP embedding, mel spectrogram)
    * plugs into. The byte-moment features here are a deterministic
    * stand-in, but downstream they are real embeddings: the output
    * `features` column feeds [[Similarity.bruteForceTopK]] /
    * [[Similarity.quantizeInt8]] unchanged.
    *
    * Output: `(idCol, n_bytes, features)`. Blocks past the end of a short
    * payload are 0. No shuffle — one narrow pass, like a real decoder.
    */
  /** Perceptual average-hash over the payload's byte blocks — media
    * near-dup's fingerprint (the aHash of image dedup, on the byte-block
    * stand-in "image" [[extractFeatures]] documents): bit `j` is set iff
    * block `j`'s mean byte value exceeds the whole payload's mean.
    * Downstream, [[Dedup.simhashPairsFrom]] bands the fingerprints into
    * hamming-distance pairs — the LAION-style image-dedup chain with the
    * decode step swapped for the container's deterministic featurizer.
    *
    * ENGINE-EXACT by construction, unlike the xxhash64 text SimHash: the
    * bit test cross-multiplies integers (`blockSum * n > totalSum *
    * blockCount` — no division, no doubles), so a SQL oracle replays the
    * full fingerprint from `hex(payload)` bit-for-bit. `blocks` is
    * capped at 63 to keep the packed hash non-negative (bit 63 stays 0;
    * band 3 of the 4-way blocking just carries a constant bit).
    *
    * Partition-local like every decode-seam op: one narrow pass, no
    * shuffle. Blocks past a short payload's end hash to 0 on both
    * engines (no bytes → no row in the oracle's block aggregation, and
    * `0 > 0` is false here).
    *
    * Output: `(idCol, n_bytes, simhash)`.
    */
  def aHash(docs: DataFrame, idCol: String, payloadCol: String,
            blocks: Int = 63): DataFrame = {
    require(blocks >= 1 && blocks <= 63,
      s"blocks must be in [1, 63] (bit 63 keeps the hash non-negative): $blocks")
    val idType = docs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"aHash needs an integral id column; '$idCol' is ${idType.typeName}")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .filter(col(idCol).isNotNull && col(payloadCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ONE definition of the block hash, shared with the AHash64
        // expression's fallback path (bit-identical by construction)
        it.map { case (id, bytes) =>
          (id, bytes.length.toLong,
            graft.functions.AHash64.byteHash(bytes, blocks))
        }
      }
      .toDF(idCol, "n_bytes", "simhash")
  }

  /** PIXEL-GRAIN perceptual hash ([[graft.functions.AHash64]] — a
    * codegen'd Catalyst expression, not a UDF): real ImageIO decode →
    * 8×8 mean-luma threshold, with [[aHash]]'s byte-block hash as the
    * fallback for undecodable payloads. This is the fingerprint that
    * survives RE-ENCODING — compressed copies of the same image share
    * ~no payload bytes (the one case image dedup exists for) but the
    * same pixels. Same output shape as [[aHash]]
    * (`idCol, n_bytes, simhash`, hash non-negative), so
    * [[Dedup.simhashPairsFrom]] bands it unchanged.
    */
  def aHashPixel(docs: DataFrame, idCol: String,
                 payloadCol: String): DataFrame = {
    val idType = docs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"aHashPixel needs an integral id column; '$idCol' is ${idType.typeName}")
    docs.filter(col(idCol).isNotNull && col(payloadCol).isNotNull)
      .select(col(idCol).cast("long").as(idCol),
        length(col(payloadCol)).cast("long").as("n_bytes"),
        graft.functions.NativeFunctions.aHash64(col(payloadCol))
          .as("simhash"))
  }

  /** Deterministic 8-bit grayscale PNG with planted pixel values —
    * the oracle-replayable image fixture (the q180 discipline for
    * pixels): samples are set on the raster directly, PNG is lossless,
    * and the PNG reader hands the same raster back, so
    * `aHashPixel(grayPng(f)) == hash(f)` exactly — a SQL oracle
    * recomputes the hash from `f`'s closed form without decoding
    * anything. Task-side helper (use inside a UDF/mapPartitions).
    */
  def grayPng(width: Int, height: Int, v: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims: $width x $height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, v(x, y) & 0xff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out),
      "JDK PNG writer unavailable")
    out.toByteArray
  }

  def extractFeatures(docs: DataFrame, idCol: String, payloadCol: String,
                      dim: Int = 16): DataFrame = {
    require(dim > 0, "feature dim must be positive")
    val idType = docs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(idType.typeName),
      s"extractFeatures needs an integral id column; '$idCol' is " +
        s"${idType.typeName} — casting would drop rows silently")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .filter(col(idCol).isNotNull && col(payloadCol).isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val block = math.max(1, (n + dim - 1) / dim)
          val feats = Array.tabulate(dim) { j =>
            val from = j * block
            val until = math.min(n, from + block)
            if (from >= until) 0.0
            else {
              var s = 0L
              var i = from
              while (i < until) { s += bytes(i) & 0xff; i += 1 }
              s.toDouble / (until - from)
            }
          }
          (id, n.toLong, feats)
        }
      }
      .toDF(idCol, "n_bytes", "features")
  }
}
