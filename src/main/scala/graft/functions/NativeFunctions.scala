package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native (codegen'd) Catalyst expression for the hot vector path.
  *
  * `aggregate`/`zip_with` higher-order functions evaluate their lambda per
  * element through interpreted expression machinery — fine for one-off
  * columns, too slow for ANN scoring where a 64-float dot product runs
  * millions of times. This expression compiles to a tight primitive loop
  * inside whole-stage codegen (no boxing, no per-element closures) and
  * falls back to an equivalent interpreted loop off the codegen path.
  *
  * Semantics match VectorFunctions.dot exactly: per-element cast of float
  * to double, then a left-to-right ordered sum — so results are
  * bit-identical to the portable fold and to the DuckDB oracle's
  * list_sum(list_transform(list_zip(...))) double fold.
  */
case class DotProductF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All-tables sign-bit LSH bucket ids for one embedding: element `t` of
  * the returned `array<int>` is the `bits`-bit bucket of hash table `t`,
  * bit `i` set iff dot(embedding, planes(t)(i)) >= 0 — the same
  * left-to-right double-accumulated dot as [[DotProductF]], so buckets
  * are bit-identical to composing `dot_f` per plane.
  *
  * The planes ride a Spark BROADCAST (torrent-distributed once per
  * executor, cached across stages) instead of being inlined as `lit()`
  * plan literals: at production embedding dims, 1024 floats × 13 bits ×
  * 16 tables is ~200k literals — plan-size, canonicalization, and
  * codegen blowup before any data is read. One expression evaluation
  * hashes ALL tables in a single pass over the vector (the embedding
  * bytes are read once, not once per table).
  */
case class LshBuckets(child: Expression,
                      planes: Broadcast[Array[Array[Array[Float]]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val pl: Array[Array[Array[Float]]] = planes.value

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val out = new Array[Int](pl.length)
    var t = 0
    while (t < pl.length) {
      val tbl = pl(t)
      var bucket = 0
      var i = 0
      while (i < tbl.length) {
        val plane = tbl(i)
        val n = math.min(emb.numElements(), plane.length)
        var acc = 0.0
        var j = 0
        while (j < n) {
          acc += emb.getFloat(j).toDouble * plane(j).toDouble
          j += 1
        }
        if (acc >= 0) bucket |= (1 << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lshPlanesBc", planes,
      "org.apache.spark.broadcast.Broadcast")
    // deserialize the broadcast once per task, not once per row
    val planesVar = ctx.addMutableState("float[][][]", "lshPlanes",
      v => s"$v = (float[][][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, emb => {
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val tbl = ctx.freshName("tbl")
      val plane = ctx.freshName("plane")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |int[] $out = new int[$planesVar.length];
         |for (int $t = 0; $t < $planesVar.length; $t++) {
         |  float[][] $tbl = $planesVar[$t];
         |  int $bucket = 0;
         |  for (int $i = 0; $i < $tbl.length; $i++) {
         |    float[] $plane = $tbl[$i];
         |    int $n = java.lang.Math.min($emb.numElements(), $plane.length);
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += (double) $emb.getFloat($j) * (double) $plane[$j];
         |    }
         |    if ($acc >= 0) $bucket |= (1 << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest k-means centroids for one embedding, nearest
  * first — the IVF cell-assignment hot path. Element `p` of the returned
  * `array<int>` is the index of the (p+1)-th closest centroid by squared
  * Euclidean distance, ties broken by LOWER centroid index (and NaN
  * distances last, also by index) — exactly the order
  * `array_sort(struct(d, cell))` produces, so results are bit-identical
  * to the literal-fold plan this replaces.
  *
  * The centroids ride a Spark BROADCAST instead of being inlined as
  * per-centroid `typedLit` folds: at a production nlist (4k–65k cells ×
  * 1k dims) the literal plan is O(cells × dim) constants — constant-pool
  * and analysis blowup before any data is read, the same failure mode
  * [[LshBuckets]] removed for hyperplanes. One evaluation computes every
  * centroid distance in a single pass (the embedding bytes are read once)
  * then partial-selects the `nprobe` smallest — O(cells·(dim + nprobe))
  * per row, allocation-free beyond the two scratch arrays.
  *
  * Distances accumulate left-to-right in doubles (`(emb[j]-c[j])²`
  * summed in element order), matching the `aggregate(zip_with(...))`
  * fold bit-for-bit.
  */
case class NearestCells(child: Expression,
                        centroids: Broadcast[Array[Array[Double]]],
                        nprobe: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val cs: Array[Array[Double]] = centroids.value

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val k = cs.length
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = cs(c)
      val n = math.min(emb.numElements(), cen.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val diff = emb.getFloat(j).toDouble - cen(j)
        acc += diff * diff
        j += 1
      }
      d(c) = acc
      c += 1
    }
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && d(i) < bestD) { bestD = d(i); best = i }
        i += 1
      }
      if (best < 0) { // remaining distances are all NaN → lowest index
        var i2 = 0
        while (best < 0) { if (!used(i2)) best = i2; i2 += 1 }
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("ivfCentroidsBc", centroids,
      "org.apache.spark.broadcast.Broadcast")
    // deserialize the broadcast once per task, not once per row
    val centersVar = ctx.addMutableState("double[][]", "ivfCentroids",
      v => s"$v = (double[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, emb => {
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("cen")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val diff = ctx.freshName("diff")
      val out = ctx.freshName("out")
      val used = ctx.freshName("used")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val i = ctx.freshName("i")
      val i2 = ctx.freshName("i2")
      s"""
         |int $k = $centersVar.length;
         |double[] $d = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double[] $cen = $centersVar[$c];
         |  int $n = java.lang.Math.min($emb.numElements(), $cen.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $diff = (double) $emb.getFloat($j) - $cen[$j];
         |    $acc += $diff * $diff;
         |  }
         |  $d[$c] = $acc;
         |}
         |int[] $out = new int[$nprobe];
         |boolean[] $used = new boolean[$k];
         |for (int $p = 0; $p < $nprobe; $p++) {
         |  int $best = -1;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $i = 0; $i < $k; $i++) {
         |    if (!$used[$i] && $d[$i] < $bestD) { $bestD = $d[$i]; $best = $i; }
         |  }
         |  if ($best < 0) {
         |    for (int $i2 = 0; $best < 0; $i2++) { if (!$used[$i2]) $best = $i2; }
         |  }
         |  $used[$best] = true;
         |  $out[$p] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-probe PQ distance tables ([[graft.ops.Pq]]): for a probe
  * embedding and a broadcast codebook `[sub][code][subDim]`, emit the
  * `m × k` table of squared-L2 distances from the probe's s-th slice to
  * subspace s's code c — the asymmetric-distance lookup table, built
  * ONCE per probe row in a single codegen'd loop instead of an m·k-row
  * join. Raw doubles out; callers quantize with Catalyst `round` so the
  * arithmetic is bit-identical to the relational ADC path and the SQL
  * oracle. Slice s covers elements [s·subDim, (s+1)·subDim); a probe
  * shorter than the codebook's dim treats missing elements as absent
  * (the loop bounds to the overlap, matching `zip_with`'s null-free
  * prefix semantics for equal-length inputs).
  */
case class PqDistTables(child: Expression,
                        codebook: Broadcast[Array[Array[Array[Double]]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_dist_tables expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_tables"

  @transient private lazy val cb: Array[Array[Array[Double]]] = codebook.value

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val m = cb.length
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val codes = cb(s)
      val k = codes.length
      val subDim = if (k > 0) codes(0).length else 0
      val off = s * subDim
      val row = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cen = codes(c)
        val n = math.min(math.max(emb.numElements() - off, 0), subDim)
        var acc = 0.0
        var j = 0
        while (j < n) {
          val diff = emb.getFloat(off + j).toDouble - cen(j)
          acc += diff * diff
          j += 1
        }
        row(c) = acc
        c += 1
      }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqCodebookBc", codebook,
      "org.apache.spark.broadcast.Broadcast")
    // deserialize the broadcast once per task, not once per row
    val cbVar = ctx.addMutableState("double[][][]", "pqCodebook",
      v => s"$v = (double[][][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, emb => {
      val m = ctx.freshName("m")
      val rows = ctx.freshName("rows")
      val s = ctx.freshName("s")
      val codes = ctx.freshName("codes")
      val k = ctx.freshName("k")
      val subDim = ctx.freshName("subDim")
      val off = ctx.freshName("off")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val cen = ctx.freshName("cen")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val diff = ctx.freshName("diff")
      s"""
         |int $m = $cbVar.length;
         |Object[] $rows = new Object[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $codes = $cbVar[$s];
         |  int $k = $codes.length;
         |  int $subDim = $k > 0 ? $codes[0].length : 0;
         |  int $off = $s * $subDim;
         |  double[] $row = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double[] $cen = $codes[$c];
         |    int $n = java.lang.Math.min(
         |      java.lang.Math.max($emb.numElements() - $off, 0), $subDim);
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double $diff = (double) $emb.getFloat($off + $j) - $cen[$j];
         |      $acc += $diff * $diff;
         |    }
         |    $row[$c] = $acc;
         |  }
         |  $rows[$s] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC lookup-sum ([[graft.ops.Pq]]): given a probe's quantized distance
  * table `array<array<long>>` and a candidate's codes `array<int>`,
  * return Σ_s table[s][codes[s]] — the per-pair asymmetric distance as
  * one tight codegen'd loop. This runs once per (probe, candidate) pair,
  * the hottest spot of PQ search; a `aggregate`/`element_at` lambda
  * chain evaluates interpreted per element and measurably drags the
  * whole scoring stage. Exact long arithmetic, identical to the lambda
  * and relational forms (spec-pinned). Out-of-range codes throw — a
  * mismatched codebook/codes pairing must fail loudly, not rank garbage.
  */
case class PqAdcScore(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<array<bigint>>, array<int>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(tables: Any, codes: Any): Any = {
    val t = tables.asInstanceOf[ArrayData]
    val c = codes.asInstanceOf[ArrayData]
    val m = math.min(t.numElements(), c.numElements())
    var acc = 0L
    var s = 0
    while (s < m) {
      acc += t.getArray(s).getLong(c.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tables, codes) => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |int $m = java.lang.Math.min($tables.numElements(), $codes.numElements());
         |long $acc = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $tables.getArray($s).getLong($codes.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression —
  * Spark ships no normalizer function, yet crawl corpora mix composed and
  * decomposed forms of the same grapheme ("café" as 4 or 5 code points),
  * which silently defeats exact/line/shingle dedup and stable hashing.
  * Normalize before any fingerprint. `java.text.Normalizer` is the JDK's
  * ICU-derived implementation; the same call runs in codegen and in the
  * interpreted fallback, so results are identical on and off the
  * whole-stage path (and match DuckDB's `nfc_normalize`).
  */
case class NormalizeUtf8(child: Expression, form: String = "NFC")
  extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"normalize form must be NFC/NFD/NFKC/NFKD, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_utf8 expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_utf8"

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(input.toString,
        java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      // `form` is constructor-validated against the enum, so inlining the
      // qualified constant is safe and keeps the hot path allocation-free
      // beyond the unavoidable String round-trip
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Image container-header sniff + dimension parse over an opaque binary
  * payload — the metadata half of the multimodal seam that needs no
  * codec at all: PNG (IHDR fixed offsets), GIF (logical screen
  * descriptor, little-endian), and JPEG (SOF marker scan — APP/COM
  * segments are length-skipped, so EXIF blobs of any size parse) all
  * publish width/height in the first bytes. Output `array<int>` of
  * `[format, width, height]` (format 0=png, 1=jpeg, 2=gif); NULL for
  * unrecognized/truncated payloads — a filterable signal, never a throw
  * (corrupt media is data, not a bug, at 100 TB). One tight byte scan,
  * no allocation beyond the 3-int result, codegen'd via a static call.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_meta expects binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |${ev.value} = graft.functions.ImageMeta.parse($b);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {
  val FormatPng = 0
  val FormatJpeg = 1
  val FormatGif = 2

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** `[format, width, height]` or null. Static (JIT-friendly from the
    * generated code) and total: no input throws.
    */
  def parse(b: Array[Byte]): ArrayData = {
    if (b == null) return null
    // PNG: 8-byte signature, IHDR payload at 16 (sig + length + "IHDR")
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && (b(4) & 0xff) == 0x0d &&
        (b(5) & 0xff) == 0x0a && (b(6) & 0xff) == 0x1a &&
        (b(7) & 0xff) == 0x0a) {
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return null
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
      return new GenericArrayData(Array(FormatPng, w.toInt, h.toInt))
    }
    // GIF87a / GIF89a: logical screen descriptor right after the tag
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) return null
      return new GenericArrayData(Array(FormatGif, w, h))
    }
    // JPEG: SOI then marker segments; dims live in the first SOFn
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // desynced marker stream
        // fill bytes: any number of 0xff may pad before the marker id
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return null
        val marker = b(j) & 0xff
        if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 1 // standalone marker, no length field
        } else if (marker == 0xd9 || marker == 0xda) {
          return null // EOI / start-of-scan without a SOF: no dims
        } else {
          if (j + 2 >= b.length) return null
          val segLen = be16(b, j + 1)
          if (segLen < 2) return null
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (j + 8 >= b.length) return null
            val h = be16(b, j + 4); val w = be16(b, j + 6)
            if (w <= 0 || h <= 0) return null
            return new GenericArrayData(Array(FormatJpeg, w, h))
          }
          i = j + 1 + segLen
        }
      }
      return null
    }
    null
  }
}

/** Perceptual average-hash over an opaque image payload — the
  * pixel-grain dedup fingerprint ([[graft.ops.Multimodal.aHash]]'s
  * byte-grain stand-in promoted to real pixels): decode via the JDK's
  * ImageIO (PNG/GIF/JPEG/BMP — zero-egress safe, no external codec),
  * downsample to an 8×8 luma grid (pixel → cell by `(y*8)/h, (x*8)/w`
  * integer floors), set bit `cy*8+cx` iff the cell's mean luma exceeds
  * the image's mean — all INTEGER-EXACT (cross-multiplied sums, no
  * doubles), so a SQL oracle replays the hash from planted pixel
  * values. Bit 63 stays 0 (cell 63 carries no bit), keeping the packed
  * hash non-negative like every fingerprint in the engine — signed
  * band shifts and BIGINT oracles stay safe.
  *
  * UNDECODABLE payloads fall back to the byte-block hash
  * ([[AHash64.byteHash]], bit-identical to `Multimodal.aHash`) — a
  * filterable-but-never-null fingerprint: corrupt media is data, not a
  * bug, at 100 TB. The two value spaces never collide in practice (a
  * re-encoded copy of a decodable image is decodable), and the
  * fallback remains hex-payload oracle-replayable.
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ahash64 expects binary, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ahash64"

  override def nullSafeEval(input: Any): Any =
    AHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.AHash64.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHash64 {
  // decode in memory: the default disk-backed ImageInputStream cache
  // would add a temp-file round trip per row
  javax.imageio.ImageIO.setUseCache(false)

  /** Static entry (JIT-friendly from generated code) and total for
    * DATA errors: any undecodable input takes the byte fallback, never
    * throws. Only NonFatal decode failures are remapped — a fatal error
    * (OutOfMemoryError on a decompression-bomb payload, StackOverflow)
    * must propagate, or the row's fingerprint would depend on executor
    * memory headroom and could differ between runs/executors, breaking
    * the deterministic-fingerprint contract.
    */
  def compute(b: Array[Byte]): Long = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return byteHash(b, 63)
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return byteHash(b, 63)
    // raw raster samples, NOT getRGB: gray rasters pass through
    // untouched (getRGB would gamma-convert gray→sRGB and break
    // integer-exactness); 3+ bands take integer BT.601 luma
    val raster = img.getRaster
    val bands = raster.getNumBands
    val n = w.toLong * h
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = (y * 8) / h
      var x = 0
      while (x < w) {
        val v =
          if (bands >= 3)
            (299 * raster.getSample(x, y, 0) + 587 * raster.getSample(x, y, 1)
              + 114 * raster.getSample(x, y, 2)) / 1000
          else raster.getSample(x, y, 0)
        val c = cy * 8 + (x * 8) / w
        cellSum(c) += v; cellCnt(c) += 1; total += v
        x += 1
      }
      y += 1
    }
    // 8-bit samples stay exact in long up to ~1.9e8 px; 16-bit rasters
    // or giant frames cross-multiply in BigInt
    val exact = n <= 4000000 ||
      (n <= 190000000 && img.getColorModel.getPixelSize <= 32)
    var hash = 0L
    var c = 0
    while (c < 63) { // bit 63 stays 0: non-negative hash
      val bit =
        if (cellCnt(c) == 0L) false
        else if (exact) cellSum(c) * n > total * cellCnt(c)
        else BigInt(cellSum(c)) * n > BigInt(total) * cellCnt(c)
      if (bit) hash |= 1L << c
      c += 1
    }
    hash
  }

  /** The byte-grain block hash — ONE definition shared with
    * [[graft.ops.Multimodal.aHash]]'s mapPartitions path, so the
    * expression fallback and the byte-grain op are bit-identical by
    * construction (spec-pinned).
    */
  def byteHash(bytes: Array[Byte], blocks: Int): Long = {
    val n = bytes.length
    val blk = math.max(1, (n + blocks - 1) / blocks)
    var total = 0L
    var i = 0
    while (i < n) { total += bytes(i) & 0xff; i += 1 }
    // blockSum * n stays in Long up to n ~ 190M bytes (255 * n^2
    // < 2^63); larger payloads cross-multiply in BigInt
    val exact = n <= 190000000
    var hash = 0L
    var j = 0
    while (j < blocks) {
      val from = j * blk
      val until = math.min(n, from + blk)
      if (from < until) {
        var s = 0L
        var k = from
        while (k < until) { s += bytes(k) & 0xff; k += 1 }
        val c = until - from
        val bit =
          if (exact) s * n > total * c
          else BigInt(s) * n > BigInt(total) * c
        if (bit) hash |= 1L << j
      }
      j += 1
    }
    hash
  }
}

/** Audio/video container-header parse — [[ImageMeta]]'s time-media
  * sibling, again codec-free: WAV publishes channels / sample rate /
  * byte rate in its `fmt ` chunk (RIFF chunk scan, little-endian) and
  * the `data` chunk size fixes the duration; MP4 (ISO BMFF) publishes
  * timescale + duration in `moov/mvhd` (big-endian box walk, v0 and v1
  * layouts). Output `array<long>` of
  * `[format, channels, sample_rate, duration_ms]` (format 0=wav,
  * 1=mp4; channels/sample_rate are -1 for mp4); NULL for
  * unrecognized/truncated payloads — corrupt media is filterable data.
  */
case class MediaMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_meta expects binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "media_meta"

  override def nullSafeEval(input: Any): Any =
    MediaMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |${ev.value} = graft.functions.MediaMeta.parse($b);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaMeta {
  val FormatWav = 0L
  val FormatMp4 = 1L

  private def le16(b: Array[Byte], i: Int): Long =
    ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** `[format, channels, sample_rate, duration_ms]` or null. Total. */
  def parse(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") {
      var i = 12
      var channels = -1L; var rate = -1L; var byteRate = -1L
      var dataSize = -1L
      while (i + 8 <= b.length) {
        val id = tag(b, i)
        val size = le32(b, i + 4)
        if (id == "fmt " && i + 8 + 16 <= b.length) {
          channels = le16(b, i + 10)
          rate = le32(b, i + 12)
          byteRate = le32(b, i + 16)
        } else if (id == "data") dataSize = size
        // chunks are word-aligned: odd sizes pad one byte. The 32-bit
        // size field is untrusted: a value like 0xFFFFFFF8 truncated to
        // Int is negative and would advance the offset by ZERO — an
        // infinite loop inside a codegen'd expression. Reject any size
        // whose next offset doesn't fit in Int or doesn't strictly
        // advance: corrupt media is data, never a wedged task.
        val next = i.toLong + 8L + size + (size & 1L)
        if (next <= i || next > Int.MaxValue) return null
        i = next.toInt
      }
      if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataSize < 0)
        return null
      return new GenericArrayData(Array(FormatWav, channels, rate,
        dataSize * 1000L / byteRate))
    }
    // ISO BMFF: top-level box walk to moov, child walk to mvhd
    var i = 0
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      if (size < 8) return null // 64-bit/extends-to-eof boxes unsupported
      if (tag(b, i + 4) == "moov") {
        var j = i + 8
        val end = math.min(b.length.toLong, i + size).toInt
        while (j + 8 <= end) {
          val csize = be32(b, j)
          if (csize < 8) return null
          if (tag(b, j + 4) == "mvhd" && j + 9 <= end) {
            val version = b(j + 8) & 0xff
            if (version == 0 && j + 28 <= end) {
              val ts = be32(b, j + 20); val dur = be32(b, j + 24)
              if (ts <= 0) return null
              return new GenericArrayData(Array(FormatMp4, -1L, -1L,
                dur * 1000L / ts))
            } else if (version == 1 && j + 40 <= end) {
              val ts = be32(b, j + 28); val dur = be64(b, j + 32)
              if (ts <= 0) return null
              return new GenericArrayData(Array(FormatMp4, -1L, -1L,
                dur * 1000L / ts))
            } else return null
          }
          // csize is an untrusted 32-bit field: guard the same way as
          // the RIFF walk (no Int truncation, strict advance).
          val nextJ = j.toLong + csize
          if (nextJ <= j || nextJ > Int.MaxValue) return null
          j = nextJ.toInt
        }
        return null
      }
      val nextI = i.toLong + size
      if (nextI <= i || nextI > Int.MaxValue) return null
      i = nextI.toInt
    }
    null
  }
}

object NativeFunctions {

  /** Registry of native functions, shared by per-session registration
    * (GraftSession.tune) and the cluster-wide GraftExtensions installer.
    */
  val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_f" -> { args =>
      require(args.length == 2, "dot_f takes 2 arguments")
      DotProductF(args(0), args(1))
    },
    "norm_nfc" -> { args =>
      require(args.length == 1, "norm_nfc takes 1 argument")
      NormalizeUtf8(args(0), "NFC")
    },
    "pq_adc_score" -> { args =>
      require(args.length == 2, "pq_adc_score takes 2 arguments")
      PqAdcScore(args(0), args(1))
    },
    "image_meta" -> { args =>
      require(args.length == 1, "image_meta takes 1 argument")
      ImageMeta(args(0))
    },
    "media_meta" -> { args =>
      require(args.length == 1, "media_meta takes 1 argument")
      MediaMeta(args(0))
    },
    "ahash64" -> { args =>
      require(args.length == 1, "ahash64 takes 1 argument")
      AHash64(args(0))
    })

  // weak keys: sessions must stay collectible after stop(); synchronized:
  // Spark supports multi-threaded job submission on one session, and an
  // unsynchronized WeakHashMap corrupts under concurrent add
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Idempotently register the native functions on a session. */
  def register(spark: SparkSession): SparkSession = {
    // Once-per-session guard: the FIRST tune() of a session always
    // registers (replacing any foreign same-name function, so graft's
    // semantics are guaranteed), later tune() calls skip — avoiding the
    // per-query "function replaced" WARN without ever silently deferring
    // to an unknown pre-existing implementation the way a bare
    // functionExists check would. A dropped function (user ran DROP
    // TEMPORARY FUNCTION) still self-heals: absence re-triggers
    // registration on the next tune().
    val registry = spark.sessionState.functionRegistry
    val missing = fns.exists { case (name, _) =>
      !registry.functionExists(FunctionIdentifier(name)) }
    if (registered.add(spark) || missing) {
      fns.foreach { case (name, builder) =>
        registry.registerFunction(
          FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.NativeFunctions", name),
          builder)
      }
    }
    spark
  }

  /** Column API for the native dot product (registers lazily via the
    * function registry, so it works on any session passed through
    * `register`).
    */
  def dotF(a: Column, b: Column): Column = call_function("dot_f", a, b)

  /** Column API for NFC Unicode normalization (via the registry, like
    * [[dotF]]); other forms via `GraftSqlBridge`-built [[NormalizeUtf8]].
    */
  def normNfc(s: Column): Column = call_function("norm_nfc", s)

  /** Column API for the ADC lookup-sum (via the registry, like [[dotF]]). */
  def pqAdcScore(tables: Column, codes: Column): Column =
    call_function("pq_adc_score", tables, codes)

  /** Column API for [[ImageMeta]] (via the registry, like [[dotF]]). */
  def imageMeta(payload: Column): Column = call_function("image_meta", payload)

  /** Column API for [[MediaMeta]] (via the registry, like [[dotF]]). */
  def mediaMeta(payload: Column): Column = call_function("media_meta", payload)

  /** Column API for [[AHash64]] (via the registry, like [[dotF]]). */
  def aHash64(payload: Column): Column = call_function("ahash64", payload)

  /** Column API for [[LshBuckets]]. Built directly (not via the function
    * registry — the broadcast handle is not an Expression argument).
    */
  def lshBuckets(emb: Column,
                 planes: Broadcast[Array[Array[Array[Float]]]]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(LshBuckets(GraftSqlBridge.expression(emb), planes))
  }

  /** Column API for [[NearestCells]] (direct construction, like
    * [[lshBuckets]] — the broadcast handle is not an Expression argument).
    */
  def nearestCells(emb: Column, centroids: Broadcast[Array[Array[Double]]],
                   nprobe: Int): Column = {
    require(centroids.value.nonEmpty, "nearestCells: no centroids")
    require(nprobe >= 1 && nprobe <= centroids.value.length,
      s"nprobe must be in [1, ${centroids.value.length}], got $nprobe")
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      NearestCells(GraftSqlBridge.expression(emb), centroids, nprobe))
  }

  /** Column API for [[PqDistTables]] (direct construction, like
    * [[lshBuckets]] — the broadcast handle is not an Expression argument).
    */
  def pqDistTables(emb: Column,
                   codebook: Broadcast[Array[Array[Array[Double]]]]): Column = {
    require(codebook.value.nonEmpty && codebook.value(0).nonEmpty,
      "pqDistTables: empty codebook")
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      PqDistTables(GraftSqlBridge.expression(emb), codebook))
  }
}
