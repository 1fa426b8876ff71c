package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Scalar-quantization kernels — native codegen expressions, the
  * [[PqExprs]] discipline applied to [[graft.ops.Sq]]'s grid. The
  * first SQ implementation used Catalyst higher-order functions
  * (`transform` + `aggregate`); HOFs evaluate their lambda
  * INTERPRETED, outside whole-stage codegen, and the per-PAIR distance
  * in the broadcast scan paid boxing + per-element closure dispatch —
  * measured 21 s vs the PQ ADC scan's 2.0 s at n = 32k, 10× SLOWER
  * than the uncompressed exact scan it was supposed to undercut.
  * These kernels close that gap the way the PQ kernels do: one tight
  * primitive loop per row/pair, reference-object dispatch from
  * generated code.
  *
  * Arithmetic is replayed bit-for-bit from the HOF formulation (and
  * the DuckDB oracles): codes = half-up scale-0 round of
  * (x − mn)·scale via the exact BigDecimal path Spark's `round(x, 0)`
  * uses; distances de-quantize per element (mn + code·istep), fold
  * sequentially in index order from 0.0, and round half-up at 6 dp.
  * The grid rides the expressions as plan-time data (3·d doubles). */
object SqExprs {

  /** Spark `round(x, 0)`'s exact double path, then to long (the value
    * is integral, so the cast is exact). */
  def round0ToLong(x: Double): Long =
    if (java.lang.Double.isNaN(x)) 0L
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** `array<bigint>` SQ codes of an `array<double>` vector. */
  def encode(v: Column, mins: Seq[Double], scales: Seq[Double]): Column =
    Bridge.column(SqEncodeExpr(Bridge.expression(v), mins, scales))

  /** Asymmetric squared-L2 of a full-precision query vs a code row,
    * 6-dp rounded. */
  def dist(qv: Column, codes: Column, mins: Seq[Double],
      isteps: Seq[Double]): Column =
    Bridge.column(SqDistExpr(
      Bridge.expression(qv), Bridge.expression(codes), mins, isteps))

  /** Asymmetric SLOT cosine: a w-dim query slot vector vs the `cpos`-th
    * w-dim slice of a FULL code row, de-quantized in place — the
    * late-interaction stage-1 scorer (PLAID's decompression stage done
    * with the SQ sidecar: score every candidate slot near-exactly from
    * stored byte codes, never fetching the full vector). 6-dp rounded;
    * sequential index-order folds so DuckDB replays the IEEE
    * sequence. */
  def slotCos(qv: Column, codes: Column, cpos: Column,
      mins: Seq[Double], isteps: Seq[Double], w: Int): Column =
    Bridge.column(SqSlotCosExpr(Bridge.expression(qv),
      Bridge.expression(codes), Bridge.expression(cpos), mins, isteps, w))
}

/** See [[SqExprs.encode]]. */
case class SqEncodeExpr(child: Expression, mins: Seq[Double],
    scales: Seq[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sq_encode needs ARRAY<DOUBLE>, got $t")
  }

  @transient private lazy val mn: Array[Double] = mins.toArray
  @transient private lazy val sc: Array[Double] = scales.toArray

  /** Public so generated code can call it via the reference object. */
  def enc(v: ArrayData): ArrayData = {
    val n = math.min(v.numElements(), mn.length)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = SqExprs.round0ToLong((v.getDouble(i) - mn(i)) * sc(i))
      i += 1
    }
    new GenericArrayData(out.map(Long.box))
  }

  override def nullSafeEval(input: Any): Any =
    enc(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqEncode", this, classOf[SqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.enc($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncodeExpr =
    copy(child = newChild)
}

/** See [[SqExprs.dist]]: left = query `array<double>`, right = codes
  * `array<bigint>`. */
case class SqDistExpr(left: Expression, right: Expression,
    mins: Seq[Double], isteps: Seq[Double]) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sq_dist needs (ARRAY<DOUBLE>, ARRAY<BIGINT>), got ($l, $r)")
    }

  @transient private lazy val mn: Array[Double] = mins.toArray
  @transient private lazy val st: Array[Double] = isteps.toArray

  /** Public so generated code can call it via the reference object.
    * Sequential fold from 0.0 in index order — the HOF/`list_reduce`
    * IEEE sequence exactly. */
  def dist(qv: ArrayData, codes: ArrayData): Double = {
    val n = math.min(qv.numElements(), mn.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val recon = mn(i) + codes.getLong(i).toDouble * st(i)
      val diff = qv.getDouble(i) - recon
      acc += diff * diff
      i += 1
    }
    PqExprs.round6dp(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqDist", this, classOf[SqDistExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.dist($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** See [[SqExprs.slotCos]]: first = w-dim query slot `array<double>`,
  * second = FULL code row `array<bigint>`, third = slot index `int`.
  * Reconstruction reads mins/isteps at the slice offset, so the one
  * stored code row serves every slot — no per-slot code storage. */
case class SqSlotCosExpr(first: Expression, second: Expression,
    third: Expression, mins: Seq[Double], isteps: Seq[Double], w: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"sq_slot_cos needs (ARRAY<DOUBLE>, ARRAY<BIGINT>, INT), got ($a, $b, $c)")
    }

  @transient private lazy val mn: Array[Double] = mins.toArray
  @transient private lazy val st: Array[Double] = isteps.toArray

  /** Public so generated code can call it via the reference object.
    * Sequential index-order folds from 0.0 (dot, both norms in one
    * pass), 6-dp rounded — the cosSql IEEE sequence. Zero-norm slots
    * (a zero-padded query slot, or a code slice reconstructing to all
    * zeros on constant-zero dims) score 0.0 instead of NaN: both
    * engines' max() rank NaN greatest, so an unguarded division would
    * silently promote degenerate candidates into the stage-1 top-C —
    * and the oracle replays the same arithmetic, so hashes could
    * never catch it (the r11 advice finding; the oracle mirrors this
    * CASE). Sums of squares are exactly 0.0 iff every element is. */
  def cosSlot(qv: ArrayData, codes: ArrayData, cpos: Int): Double = {
    val off = cpos * w
    var dot = 0.0
    var qq = 0.0
    var cc = 0.0
    var i = 0
    while (i < w) {
      val recon = mn(off + i) + codes.getLong(off + i).toDouble * st(off + i)
      val q = qv.getDouble(i)
      dot += q * recon
      qq += q * q
      cc += recon * recon
      i += 1
    }
    if (qq == 0.0 || cc == 0.0) 0.0
    else PqExprs.round6dp(dot / (math.sqrt(qq) * math.sqrt(cc)))
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    cosSlot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqSlotCos", this, classOf[SqSlotCosExpr].getName)
    defineCodeGen(ctx, ev, (a, b, c) => s"$ref.cosSlot($a, $b, $c)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SqSlotCosExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
