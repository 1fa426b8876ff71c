package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact aggregation over uint256 money columns. The data model keeps
  * them as decimal strings because 2^256−1 > Decimal(38,0) (SURVEY
  * §1.3, §7.5-1) — which leaves plain Spark with no exact `sum`. This
  * TypedImperativeAggregate sums them as arbitrary-precision integers:
  * buffer = BigInteger (serialized as two's-complement bytes for
  * partial-aggregate shuffle), inputs = decimal strings or 0x-hex
  * words, output = decimal string. Map-side partial aggregation works
  * like any built-in agg, so the shuffle carries one ~32-byte buffer
  * per group, not the raw rows. */
case class Uint256Sum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BigInteger] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"uint256_sum needs STRING, got ${child.dataType}")

  override def createAggregationBuffer(): BigInteger = BigInteger.ZERO

  override def update(buffer: BigInteger, input: InternalRow): BigInteger = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val s = v.asInstanceOf[UTF8String].toString
      val x =
        if (s.startsWith("0x") || s.startsWith("0X"))
          if (s.length == 2) BigInteger.ZERO else new BigInteger(s.substring(2), 16)
        else new BigInteger(s)
      buffer.add(x)
    }
  }

  override def merge(b1: BigInteger, b2: BigInteger): BigInteger = b1.add(b2)

  override def eval(buffer: BigInteger): Any =
    UTF8String.fromString(buffer.toString)

  override def serialize(buffer: BigInteger): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): BigInteger = new BigInteger(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): Uint256Sum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Uint256Sum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Uint256Sum =
    copy(child = newChildren.head)
  override def prettyName: String = "uint256_sum"
}

object Uint256 {
  /** Column API: exact sum of a decimal-string / 0x-hex uint256 column. */
  def sum(c: Column): Column =
    Bridge.column(Uint256Sum(Bridge.expression(c)).toAggregateExpression())
}
