package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst expressions for MEDIA payloads — the perceptual-
  * hash layer of the multimodal pillar. The reference pipeline's image
  * near-dup stage needs a content hash with METRIC structure (small
  * visual change → small Hamming distance), which the exact checksums
  * (q60's md5) cannot give. dHash is the standard public recipe:
  * downsample to a (rows+? ) 8×9 grayscale grid, emit one bit per
  * horizontally adjacent pixel pair (left < right), 64 bits total.
  *
  * The CODEC stays stubbed in this container (no image libs — see
  * [[graft.ops.Multimodal]]): the "grayscale grid" here is the
  * deterministic block-mean downsample of the RAW PAYLOAD BYTES — 72
  * equal byte segments, one per grid cell, each cell's luma = the
  * segment's byte mean. Swap the segment means for decoded-pixel
  * means and nothing else changes: the bit layout, banding, and
  * Hamming join are codec-independent. All arithmetic is integer
  * (means compare by cross-multiplication: meanA < meanB ⟺
  * sumA·lenB < sumB·lenA — exact, no floats), so a SQL engine
  * replays the hash bit for bit.
  *
  * Output shape is FOUR 16-bit quarters, not one packed 64-bit long —
  * the [[EvmExprs.simHashQuarterEval]] scale lesson verbatim: bit 63
  * would ride the sign bit, and the radius-3 banded join wants the
  * quarters as separate columns anyway (by pigeonhole, any pair
  * within total Hamming distance 3 agrees exactly on ≥ 1 quarter, so
  * the (band, quarter) equi-join finds ALL radius-3 pairs over
  * 2¹⁶-value keys — candidate volume ~n²/2¹⁶ per band). Quarter k
  * covers grid rows 2k and 2k+1. */
object MediaExprs {

  /** Grid geometry: 8 comparison rows × 9 sample columns = 72 cells,
    * 8 comparisons per row = 64 bits. */
  val GridRows = 8
  val GridCols = 9
  val GridCells: Int = GridRows * GridCols

  /** payload bytes → array<long>(4) of 16-bit dHash quarters. EMPTY
    * (non-null, zero-length) payloads hash to all-zero quarters (no
    * comparisons fire); a NULL payload never reaches this function —
    * the expression is null-propagating (`nullSafeEval`), so NULL
    * payloads yield NULL quarters, drop out of the band join in both
    * engines, and read `kept` in the dedup manifest (r13 advice: the
    * doc used to claim null → zero quarters; the null guard here is
    * for direct callers only). Static and allocation-light: one pass
    * over the bytes for the 72 segment sums, then 64 integer
    * cross-multiplications. */
  def dHashQuartersEval(payload: Array[Byte]): GenericArrayData = {
    val n = if (payload == null) 0 else payload.length
    val sums = new Array[Long](GridCells)
    val lens = new Array[Long](GridCells)
    var i = 0
    while (i < GridCells) {
      val lo = (i.toLong * n / GridCells).toInt
      val hi = ((i + 1).toLong * n / GridCells).toInt
      var s = 0L
      var j = lo
      while (j < hi) { s += (payload(j) & 0xff); j += 1 }
      sums(i) = s
      lens(i) = (hi - lo).toLong
      i += 1
    }
    val qs = new Array[Long](4)
    var r = 0
    while (r < GridRows) {
      var c = 0
      while (c < GridCols - 1) {
        val a = r * GridCols + c
        val b = a + 1
        // mean(a) < mean(b) by exact integer cross-multiplication;
        // an empty segment (len 0, sum 0) never wins a comparison
        if (sums(a) * lens(b) < sums(b) * lens(a))
          qs(r / 2) |= 1L << ((r % 2) * 8 + c)
        c += 1
      }
      r += 1
    }
    new GenericArrayData(qs)
  }

  /** Column API. */
  def dHashQuarters(c: Column): Column =
    Bridge.column(DHashQuartersExpr(Bridge.expression(c)))
}

/** BINARY payload → array<long>(4) of 16-bit dHash quarters, fused. */
case class DHashQuartersExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dhash_quarters needs BINARY, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    MediaExprs.dHashQuartersEval(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaExprs.dHashQuartersEval($c)")
  override protected def withNewChildInternal(newChild: Expression): DHashQuartersExpr =
    copy(child = newChild)
}
