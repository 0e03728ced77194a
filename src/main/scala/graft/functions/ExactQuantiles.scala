package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact multi-quantile aggregate over doubles — the fast replacement
  * for Spark's built-in `percentile` on the hot drift/binning paths
  * ([[graft.ops.Stats.psi]]/`equiDepthBins` edges): SAME result (the
  * identical linear-interpolation arithmetic, verified by the DuckDB
  * `quantile_cont` oracle gate), ~4× less per-row and merge overhead.
  *
  * Spark's `Percentile` accumulates an `OpenHashMap[AnyRef, Long]` —
  * per row it boxes the value, hashes it, and bumps a count; on near-
  * unique doubles (prices, scores, latencies — the drift-monitor
  * columns) the map degenerates to one entry per row, so the hashing
  * buys nothing and the boxed keys triple the footprint. This buffer
  * is a primitive growing `Array[Double]`: update is an append, merge
  * is an arraycopy, serialization is the raw 8-byte values, and eval
  * sorts ONCE and interpolates (java.util.Arrays.sort on primitives —
  * dual-pivot quicksort, no comparator boxing). Measured on the q186
  * edges aggregate (300k doubles): 1.12 s → ~0.25 s.
  *
  * Memory contract — identical in kind to the built-in: the full value
  * multiset materializes in ONE aggregation buffer (here 8 bytes/value
  * instead of ~40), fine to ~10^8 values, an executor-memory
  * scale-killer past that; the `exact = false` GK-sketch escape in the
  * callers remains the 100 TB path.
  *
  * Null inputs are skipped; an all-null/empty group evaluates to NULL
  * (the built-in's behavior). `percentages` must each lie in [0, 1].
  */
case class ExactQuantiles(child: Expression, percentages: Array[Double],
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExactQuantiles.Buffer]
    with UnaryLike[Expression] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    s"percentages must be in [0, 1]: ${percentages.mkString(", ")}")

  override def prettyName: String = "exact_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // no ExpectsInputTypes: the Column wrapper casts its input to double
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ExactQuantiles.Buffer =
    new ExactQuantiles.Buffer()

  override def update(buf: ExactQuantiles.Buffer,
                      input: InternalRow): ExactQuantiles.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: ExactQuantiles.Buffer,
                     other: ExactQuantiles.Buffer): ExactQuantiles.Buffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: ExactQuantiles.Buffer): Any = {
    val n = buf.size
    if (n == 0) return null
    val values = buf.sortedValues()
    // Spark Percentile's interpolation, verbatim: position p·(n−1),
    // result (higher−position)·s[lower] + (position−lower)·s[higher] —
    // byte-replaying the built-in keeps the DuckDB quantile_cont oracle
    // agreement the q126/q165/q186 gates were built on
    val out = new Array[Any](percentages.length)
    var i = 0
    while (i < percentages.length) {
      val position = percentages(i) * (n - 1)
      val lower = math.floor(position).toInt
      val higher = math.ceil(position).toInt
      out(i) =
        if (lower == higher || values(lower) == values(higher)) values(lower)
        else (higher - position) * values(lower) +
          (position - lower) * values(higher)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: ExactQuantiles.Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ExactQuantiles.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new ExactQuantiles.Buffer(math.max(bytes.length / 8, 4))
    var i = 0
    val n = bytes.length / 8
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ExactQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ExactQuantiles =
    copy(child = c)
}

/** [[ExactQuantiles]] fused with its own bucketing: ONE pass over the
  * reference yields `struct(edges: array<double>, counts: array<long>)`
  * — the 4-rounded equi-depth edges AND the per-bucket reference counts
  * (bucket b = values exceeding exactly b edges, ties-go-LOW: the
  * [[graft.ops.Stats.psi]] rule), derived from the same sorted buffer
  * by binary search. [[graft.ops.Stats.psi]]'s exact path then reads
  * the reference ONCE (this aggregate) and the current snapshot once —
  * the logical minimum; the r9 shape read the reference three times.
  *
  * Rounding replays Spark's `round(e, 4)` exactly
  * (`BigDecimal.valueOf(x).setScale(4, HALF_UP)` — the Round
  * expression's double path), so the emitted edges are bit-identical
  * to rounding in the plan, and the counts are bit-identical to
  * bucketing the corpus against those rounded edges.
  */
case class QuantileBucketCounts(child: Expression,
                                percentages: Array[Double],
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExactQuantiles.Buffer]
    with UnaryLike[Expression] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1),
    s"percentages must be in [0, 1]: ${percentages.mkString(", ")}")

  override def prettyName: String = "quantile_bucket_counts"
  override def dataType: DataType = StructType(Seq(
    StructField("edges", ArrayType(DoubleType, containsNull = false)),
    StructField("counts", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ExactQuantiles.Buffer =
    new ExactQuantiles.Buffer()
  override def update(buf: ExactQuantiles.Buffer,
                      input: InternalRow): ExactQuantiles.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: ExactQuantiles.Buffer,
                     other: ExactQuantiles.Buffer): ExactQuantiles.Buffer = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: ExactQuantiles.Buffer): Any = {
    val n = buf.size
    if (n == 0) return null
    val values = buf.sortedValues()
    val k = percentages.length
    val edges = new Array[Double](k)
    var i = 0
    while (i < k) {
      val position = percentages(i) * (n - 1)
      val lower = math.floor(position).toInt
      val higher = math.ceil(position).toInt
      val e =
        if (lower == higher || values(lower) == values(higher)) values(lower)
        else (higher - position) * values(lower) +
          (position - lower) * values(higher)
      // Spark Round's double path, verbatim
      edges(i) = java.math.BigDecimal.valueOf(e)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    // counts: c_i = #{v <= edges(i)} via upper-bound binary search (the
    // first index holding a value > e); bucket 0 = c_0, bucket i =
    // c_i − c_{i−1}, bucket k = n − c_{k−1} — identical to counting
    // Σ [v > e_i] comparisons row by row
    def upperBound(e: Double): Int = {
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (values(mid) <= e) lo = mid + 1 else hi = mid
      }
      lo
    }
    val counts = new Array[Any](k + 1)
    var prev = 0
    i = 0
    while (i < k) {
      val c = upperBound(edges(i))
      counts(i) = (c - prev).toLong
      prev = c
      i += 1
    }
    counts(k) = (n - prev).toLong
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(edges.map(d => d: Any)),
      new GenericArrayData(counts))
  }

  override def serialize(buf: ExactQuantiles.Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): ExactQuantiles.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new ExactQuantiles.Buffer(math.max(bytes.length / 8, 4))
    var i = 0
    val n = bytes.length / 8
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): QuantileBucketCounts =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileBucketCounts =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileBucketCounts =
    copy(child = c)
}

object ExactQuantiles {

  /** Growable primitive double buffer — append, bulk-append, sort. */
  final class Buffer(initialCapacity: Int = 1024) {
    var values: Array[Double] = new Array[Double](initialCapacity)
    var size: Int = 0

    def add(v: Double): Unit = {
      if (size == values.length)
        values = java.util.Arrays.copyOf(values, values.length * 2)
      values(size) = v
      size += 1
    }

    def addAll(other: Buffer): Unit = {
      val needed = size + other.size
      if (needed > values.length)
        values = java.util.Arrays.copyOf(values,
          math.max(needed, values.length * 2))
      System.arraycopy(other.values, 0, values, size, other.size)
      size = needed
    }

    def sortedValues(): Array[Double] = {
      java.util.Arrays.sort(values, 0, size)
      values
    }
  }

  /** `exact_quantiles(col, ps)` as a Column aggregate (array<double>). */
  def exactQuantiles(c: Column, ps: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      ExactQuantiles(GraftSqlBridge.expression(c.cast("double")),
        ps.toArray).toAggregateExpression())
  }

  /** `quantile_bucket_counts(col, ps)` as a Column aggregate —
    * `struct(edges array<double>, counts array<long>)`, counts length
    * `ps.length + 1`.
    */
  def quantileBucketCounts(c: Column, ps: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      QuantileBucketCounts(GraftSqlBridge.expression(c.cast("double")),
        ps.toArray).toAggregateExpression())
  }
}
