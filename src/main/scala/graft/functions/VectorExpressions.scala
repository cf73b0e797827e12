package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two array<double> columns as a NATIVE Catalyst
  * expression with whole-stage codegen.
  *
  * Escalation rationale (measured, not assumed): the built-in composition
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct but higher-order
  * functions evaluate interpreted (lambda dispatch per element); an
  * "unrolled" `element_at` sum was 6× WORSE (per-element null/bounds
  * checks). A custom BinaryExpression generates the obvious tight loop —
  * `for (i) sum += a[i]*b[i]` — inside the surrounding codegen stage, the
  * thing no built-in combination can express. This is preference order (b)
  * from the design notes: compose built-ins first, drop to a native
  * Expression only where they genuinely can't express the efficiency.
  *
  * Null semantics match the built-ins: null if either array is null;
  * elements are read null-unsafely (embedding vectors are dense by
  * construction — a null element reads as 0.0 via ArrayData.getDouble).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for graft's native functions. */
object VectorFunctions {

  val builder: Seq[Expression] => Expression =
    children => VecDot(children(0), children(1))

  /** Column-level dot product backed by [[VecDot]]. Requires
    * [[register]] (idempotent) on the session first — `call_function`
    * resolves through the function registry, which keeps this on the
    * public API surface (no private Column constructors). */
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  /** Register `vec_dot` in the session's function registry so SQL
    * (`SELECT vec_dot(a, b)`), `expr(...)` and [[vecDot]] resolve it.
    * Idempotent — already-registered sessions are left alone (a blind
    * re-register works but logs a replacement WARN per call). */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("vec_dot")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id, new ExpressionInfo(classOf[VecDot].getName, "vec_dot"), builder)
    }
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects graft's
  * native functions at session build — the standard extension point, so a
  * cluster config enables them without code changes. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      VectorFunctions.builder))
}
