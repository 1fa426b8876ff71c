package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

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

  /** Sequential-fold dot product of row data against a plan-time
    * codebook row — same fold order as [[dotEval]] over two arrays. */
  def dotRef(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b(i)
      i += 1
    }
    acc
  }

  /** Column API: both sides must already be array<double>. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Top-`p` nearest codebook centroids of an array<double> vector:
    * `array<struct<cc: double, cid: long>>` ordered by (cosine desc,
    * cid asc). The single-pass IVF assignment kernel — n rows of
    * O(K·d) compiled arithmetic with NO row materialization, no
    * window, no shuffle (the crossJoin + row_number formulation it
    * replaces pushed n×K rows through a sort exchange, the measured
    * bottleneck of the K≈√n scale remedy).
    *
    * Bit-compatibility contract with [[graft.ops.SimSearch.ivfRank]]
    * (spec-pinned): cosines round half-up at 6dp exactly as Spark's
    * `round`, ties break on the smaller centroid id, and double
    * ordering is `java.lang.Double.compare` (NaN greatest), matching
    * the window's `ORDER BY cc DESC, cid ASC`.
    * @param codebook (cid, components, l2norm) rows — pass the values
    *   the `l2norm` EXPRESSION produced so norms agree bit-for-bit. */
  def nearestCells(v: Column, codebook: Seq[(Long, Seq[Double], Double)],
      p: Int): Column =
    Bridge.column(NearestCellsExpr(Bridge.expression(v),
      codebook.map(_._1), codebook.map(_._2), codebook.map(_._3), p))
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

/** See [[VectorExprs.nearestCells]]. The codebook rides the expression
  * as plan-time data (it reaches executors inside the serialized plan —
  * the broadcast of a k-row frame, without the join). */
case class NearestCellsExpr(child: Expression, cids: Seq[Long],
    cvs: Seq[Seq[Double]], cns: Seq[Double], p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cc", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs ARRAY<DOUBLE>, got $t")
  }

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val cvArr: Array[Array[Double]] = cvs.map(_.toArray).toArray
  @transient private lazy val cnArr: Array[Double] = cns.toArray

  /** Spark `round(x, 6)`'s exact double path (mathExpressions codegen):
    * NaN/Inf pass through, else BigDecimal.valueOf half-up. */
  private def round6dp(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (cc1, cid1) strictly before (cc2, cid2) in (cc desc, cid asc)? */
  private def before(cc1: Double, cid1: Long, cc2: Double, cid2: Long): Boolean = {
    val c = java.lang.Double.compare(cc1, cc2)
    c > 0 || (c == 0 && cid1 < cid2)
  }

  /** Public so generated code can call it via the reference object. */
  def assign(v: ArrayData): ArrayData = {
    val n = math.sqrt(VectorExprs.dotEval(v, v))
    val k = cidArr.length
    val m = math.min(p, k)
    val accCc = new Array[Double](m)
    val accCid = new Array[Long](m)
    var filled = 0
    var j = 0
    while (j < k) {
      val cc = round6dp(VectorExprs.dotRef(v, cvArr(j)) / (n * cnArr(j)))
      val cid = cidArr(j)
      var pos = filled
      while (pos > 0 && before(cc, cid, accCc(pos - 1), accCid(pos - 1))) pos -= 1
      if (pos < m) {
        var t = math.min(filled, m - 1)
        while (t > pos) {
          accCc(t) = accCc(t - 1); accCid(t) = accCid(t - 1); t -= 1
        }
        accCc(pos) = cc
        accCid(pos) = cid
        if (filled < m) filled += 1
      }
      j += 1
    }
    val rows = new Array[Any](filled)
    var i = 0
    while (i < filled) {
      rows(i) = InternalRow(accCc(i), accCid(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCellsExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.assign($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}
