package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen bridges that keep whole-stage fusion for interpreted-body
  * expressions (VERDICT round-1 item #5). `CodegenFallback` poisons the
  * ENTIRE enclosing stage — `WholeStageCodegenExec` refuses any plan
  * subtree containing one, so every surrounding projection/filter falls
  * back to row-at-a-time eval with per-row boxing. These traits instead
  * emit one virtual call to the expression's own eval body through a
  * plan-shipped reference object: the stage stays codegen'd and fused;
  * only this operator's inner loop stays interpreted (it is already a
  * tight while-loop over primitives).
  */
private[graft] object FusedEval {
  /** Cast/unbox the Object returned by the eval body into the
    * generated variable's Java type.
    */
  def resultJava(dt: DataType, call: String): String = dt match {
    case LongType => s"((java.lang.Long) $call).longValue()"
    case DoubleType => s"((java.lang.Double) $call).doubleValue()"
    case IntegerType => s"((java.lang.Integer) $call).intValue()"
    case BooleanType => s"((java.lang.Boolean) $call).booleanValue()"
    case _: ArrayType => s"(org.apache.spark.sql.catalyst.util.ArrayData) $call"
    case StringType => s"(org.apache.spark.unsafe.types.UTF8String) $call"
    case BinaryType => s"(byte[]) $call"
    case other =>
      throw new IllegalStateException(s"fused codegen: unsupported $other")
  }
}

trait FusedUnary extends UnaryExpression {
  /** Public bridge so generated code (foreign package) can reach the
    * protected eval body.
    */
  final def compute(input: Any): Any = nullSafeEval(input)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("fused", this)
      s"${ev.value} = ${FusedEval.resultJava(dataType, s"$ref.compute($c)")};"
    })
}

trait FusedBinary extends BinaryExpression {
  final def compute(l: Any, r: Any): Any = nullSafeEval(l, r)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("fused", this)
      s"${ev.value} = ${FusedEval.resultJava(dataType, s"$ref.compute($l, $r)")};"
    })
}
