package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot-path EVM scalars (SURVEY
  * §7.4: promote UDFs to codegen expressions for perf). Compared to
  * ScalaUDF these skip the catalyst⇄scala converters and null-handling
  * closure — the generated code calls the static evaluator directly
  * inside whole-stage codegen. */
object EvmExprs {

  /** Static evaluators referenced from generated code. */
  def skeletonHashEval(hex: UTF8String): UTF8String = {
    val code = Hex.decode(hex.toString)
    val runtime = Evm.separateMetadata(code).map(_._1).getOrElse(code)
    UTF8String.fromString("0x" + Hex.encode(Keccak.hash256(Evm.extractSkeleton(runtime))))
  }

  def hexToDecEval(hex: UTF8String): UTF8String = {
    val h0 = hex.toString
    val h = if (h0.startsWith("0x") || h0.startsWith("0X")) h0.substring(2) else h0
    UTF8String.fromString(
      if (h.isEmpty) "0" else new java.math.BigInteger(h, 16).toString)
  }

  /** Column API. */
  def skeletonHash(c: Column): Column = Bridge.column(SkeletonHashExpr(Bridge.expression(c)))
  def hexToDec(c: Column): Column = Bridge.column(HexToDecExpr(Bridge.expression(c)))
}

/** hex bytecode (0x-optional STRING) → 0x-prefixed keccak of its
  * normalized skeleton (contract_deployment.rs:110-112 semantics). */
case class SkeletonHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"skeleton_hash needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    EvmExprs.skeletonHashEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmExprs.skeletonHashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): SkeletonHashExpr =
    copy(child = newChild)
}

/** uint256 hex word (0x-optional STRING) → decimal string (§1.3's
  * string-typed money columns). */
case class HexToDecExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"hex_to_dec needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    EvmExprs.hexToDecEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmExprs.hexToDecEval($c)")
  override protected def withNewChildInternal(newChild: Expression): HexToDecExpr =
    copy(child = newChild)
}
