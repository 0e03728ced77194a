package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object NativeFunctions {

  /** Registry of native functions, shared by per-session registration
    * (GraftSession.tune) and the cluster-wide GraftExtensions installer.
    */
  val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_f" -> { args =>
      require(args.length == 2, "dot_f takes 2 arguments")
      DotProductF(args(0), args(1))
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
}
