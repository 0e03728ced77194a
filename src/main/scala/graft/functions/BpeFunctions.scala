package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for [[BpeApply]] — ONE implementation of the greedy
  * merge scan, called from both the interpreted eval and the generated
  * code (a static call inside whole-stage codegen, the `StaticInvoke`
  * pattern), so on- and off-codegen results cannot diverge.
  */
object BpeRuntime {

  /** Pre-resolve a broadcast `[lhs, rhs]` merge list to UTF8String
    * triples `[lhs, rhs, lhs+rhs]` — once per task, not per row.
    */
  def prepare(merges: Array[Array[String]]): Array[Array[UTF8String]] =
    merges.map(p => Array(UTF8String.fromString(p(0)),
      UTF8String.fromString(p(1)), UTF8String.fromString(p(0) + p(1))))

  /** Apply merges IN RANK ORDER; each rank is one left-to-right
    * non-overlapping scan (a merged symbol is never the left side of
    * another merge in the same pass — the semantics of string
    * `replace`, which the DuckDB oracle replays, and of the reference
    * BPE formulation).
    */
  def applyMerges(syms: ArrayData, merges: Array[Array[UTF8String]]): ArrayData = {
    var arr = new Array[UTF8String](syms.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = syms.getUTF8String(i); i += 1 }
    var n = arr.length
    var m = 0
    while (m < merges.length) {
      val lhs = merges(m)(0); val rhs = merges(m)(1); val merged = merges(m)(2)
      val out = new Array[UTF8String](n)
      var o = 0
      var j = 0
      while (j < n) {
        if (j + 1 < n && lhs.equals(arr(j)) && rhs.equals(arr(j + 1))) {
          out(o) = merged; o += 1; j += 2
        } else {
          out(o) = arr(j); o += 1; j += 1
        }
      }
      arr = out; n = o
      m += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      arr.asInstanceOf[Array[AnyRef]], n).asInstanceOf[Array[Any]])
  }
}

/** Byte-pair-encoding application as a native expression: input is a
  * symbol sequence (`array<string>`, initially the word's characters),
  * output is the sequence after applying every broadcast merge in rank
  * order. The merge table rides a Spark broadcast — learning produces it
  * once on the driver, encoding streams the corpus through whole-stage
  * codegen with a single static call per row ([[BpeRuntime]]), never a
  * Python/Scala UDF and never a per-merge plan node (a 32k-merge
  * production vocabulary as chained expressions would be a 32k-deep
  * plan).
  */
case class BpeApply(child: Expression,
                    merges: Broadcast[Array[Array[String]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  @transient private lazy val ms: Array[Array[UTF8String]] =
    BpeRuntime.prepare(merges.value)

  override def nullSafeEval(input: Any): Any =
    BpeRuntime.applyMerges(input.asInstanceOf[ArrayData], ms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bpeMergesBc", merges,
      "org.apache.spark.broadcast.Broadcast")
    // resolve broadcast + UTF8String conversion once per task, not per row
    val mergesVar = ctx.addMutableState(
      "org.apache.spark.unsafe.types.UTF8String[][]", "bpeMerges",
      v => s"$v = graft.functions.BpeRuntime.prepare(" +
        s"(java.lang.String[][]) $bcRef.value());")
    nullSafeCodeGen(ctx, ev, syms =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.BpeRuntime.applyMerges($syms, $mergesVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {

  /** Column API for [[BpeApply]] (direct construction — the broadcast
    * handle is not an Expression argument, as with `lshBuckets`).
    */
  def bpeApply(syms: Column, merges: Broadcast[Array[Array[String]]]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BpeApply(GraftSqlBridge.expression(syms), merges))
  }
}
