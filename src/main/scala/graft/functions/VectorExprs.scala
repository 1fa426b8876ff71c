package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen expression for the vector hot path (SURVEY §7.4
  * pattern: functions > UDFs > anything; a Catalyst expression with
  * doGenCode beats interpreted higher-order lambdas). The interpreted
  * `aggregate(zip_with(...))` dot product allocates a zipped array and
  * evaluates two lambda closures per element; this loops over the
  * unsafe array data directly inside whole-stage codegen.
  *
  * Determinism contract (shared with the DuckDB oracles in
  * [[graft.queries.VectorOps]]): strict sequential left-fold in index
  * order, so the IEEE double operation sequence — and therefore the
  * hash-compared result — is identical to `list_reduce` in DuckDB and
  * to the previous `aggregate(zip_with(...))` formulation. */
object VectorExprs {

  /** Sequential-fold dot product over the common prefix length. */
  def dotEval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column API: both sides must already be array<double>. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
}

/** array<double> ⋅ array<double> → double, sequential fold order. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product needs (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dotEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorExprs.dotEval($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
