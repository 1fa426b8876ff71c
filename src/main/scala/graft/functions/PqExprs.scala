package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels — the vector-COMPRESSION leg of the ANN
  * stack (IVF in [[graft.ops.SimSearch]] bounds which vectors are
  * scored; PQ bounds how many bytes scoring each one costs). A d-dim
  * vector is split into M contiguous subspaces and each subspace is
  * quantized to the nearest of Ksub per-subspace centroids, so the
  * stored representation collapses from d doubles (512 B at d=64) to M
  * small codes (M bytes at Ksub≤256) and approximate distances are
  * computed against codes alone — the asymmetric-distance (ADC) scan.
  * At 10^10 corpus vectors that is the difference between a 5 TB scan
  * and an 80 GB one per full sweep.
  *
  * All three kernels are native codegen expressions (the repo's
  * standing preference: expression > UDF), and all arithmetic follows
  * the family determinism contract shared with the DuckDB oracles in
  * [[graft.queries.VectorOps]]: sequential left folds in index order,
  * per-subspace squared-L2 distances rounded half-up at 6 dp BEFORE
  * any comparison or sum, ties broken on the lower code index, ADC
  * sums folded in subspace order and rounded at 6 dp — so hashes
  * match bit-for-bit across engines.
  *
  * The codebook rides the expressions as plan-time data (M×Ksub×(d/M)
  * doubles — 8 KiB at the registered shape), the same bounded-collect
  * sanction as [[VectorExprs.nearestCells]]' coarse codebook.
  */
object PqExprs {

  /** Sequential-fold squared L2 distance between `a[off..off+len)` and
    * the codebook row `c` — index-ascending, one fused multiply-add
    * per element, mirrored by the oracles' `list_reduce` replay. */
  def l2sqRef(a: ArrayData, off: Int, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = c.length
    while (i < n) {
      val diff = a.getDouble(off + i) - c(i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  /** Sequential-fold squared L2 over two full arrays (common prefix). */
  def l2sqEval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val diff = a.getDouble(i) - b.getDouble(i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  /** Spark `round(x, 6)`'s exact double path. */
  def round6dp(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** array<double> × array<double> → double squared L2 (exact column). */
  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2SquaredExpr(Bridge.expression(a), Bridge.expression(b)))

  /** PQ-encode an array<double> vector: `array<int>` of M codes, code m
    * = argmin_j round6(l2sq(v_sub_m, books(m)(j))) with ties to the
    * lower j. */
  def encode(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(v), books))

  /** The query-side ADC distance table: `array<double>` of M×Ksub
    * entries, entry m*Ksub+j = round6(l2sq(v_sub_m, books(m)(j))).
    * Computed ONCE per query row; every corpus code the query scores
    * against costs M array reads, not M×(d/M) multiplies. */
  def distTable(v: Column, books: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqDistTableExpr(Bridge.expression(v), books))

  /** ADC score of a code row against a query's distance table:
    * round6(Σ_m dtab[m*Ksub + codes[m]]), folded in subspace order. */
  def adcScore(dtab: Column, codes: Column, ksub: Int): Column =
    Bridge.column(AdcScoreExpr(
      Bridge.expression(dtab), Bridge.expression(codes), ksub))
}

/** array<double> × array<double> → double, sequential-fold squared L2. */
case class L2SquaredExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"l2sq needs (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    PqExprs.l2sqEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqExprs.l2sqEval($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SquaredExpr =
    copy(left = newLeft, right = newRight)
}

/** Shared codebook plumbing for the two book-carrying expressions. */
sealed trait PqBookExpr { self: Expression =>
  def books: Seq[Seq[Seq[Double]]]
  @transient protected lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  protected def subDim: Int = books.head.head.length
  protected def mCount: Int = books.length
  protected def kSub: Int = books.head.length
}

/** See [[PqExprs.encode]]. */
case class PqEncodeExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqBookExpr {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode needs ARRAY<DOUBLE>, got $t")
  }

  /** Public so generated code can call it via the reference object. */
  def encode(v: ArrayData): ArrayData = {
    val m = mCount
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val book = bookArr(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < book.length) {
        val d = PqExprs.round6dp(PqExprs.l2sqRef(v, off, book(j)))
        // strict < keeps the lower j on ties (j ascends)
        if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes.map(Int.box))
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** See [[PqExprs.distTable]]. */
case class PqDistTableExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqBookExpr {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_dist_table needs ARRAY<DOUBLE>, got $t")
  }

  /** Public so generated code can call it via the reference object. */
  def table(v: ArrayData): ArrayData = {
    val m = mCount
    val k = kSub
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val book = bookArr(s)
      var j = 0
      while (j < k) {
        out(s * k + j) = PqExprs.round6dp(PqExprs.l2sqRef(v, off, book(j)))
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out.map(Double.box))
  }

  override def nullSafeEval(input: Any): Any =
    table(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDistTable", this, classOf[PqDistTableExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.table($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTableExpr =
    copy(child = newChild)
}

/** See [[PqExprs.adcScore]]: left = dtab array<double> (M×Ksub), right =
  * codes array<int> (M). */
case class AdcScoreExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"adc_score needs (ARRAY<DOUBLE>, ARRAY<INT>), got ($l, $r)")
    }

  /** Public so generated code can call it via the reference object. */
  def score(dtab: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += dtab.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    PqExprs.round6dp(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcScore", this, classOf[AdcScoreExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.score($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScoreExpr =
    copy(left = newLeft, right = newRight)
}
