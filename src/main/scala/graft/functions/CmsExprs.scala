package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch probe as a native expression — the frequency twin
  * of [[BloomExprs]]. A CMS NEVER underestimates a count (each cell is
  * a sum over a superset of the item's occurrences), so for a
  * threshold query "items with count ≥ T" the per-row predicate
  * `estimate(item) ≥ T` admits a SUPERSET of the true heavy items —
  * no false negatives — and an exact recount of only the admitted
  * rows produces exactly the ungated GROUP BY ... HAVING answer. The
  * gate's dividend at scale: the exact count shuffle's map-side
  * combine collapses to (partitions × admitted vocabulary) instead of
  * (partitions × FULL vocabulary) — for web-scale n-gram vocabularies
  * (10^9+ distinct) that is the difference between a bounded shuffle
  * and one proportional to the vocabulary.
  *
  * Built on Spark's public `org.apache.spark.util.sketch
  * .CountMinSketch` (`Dataset.stat.countMinSketch` aggregates it
  * distributedly; merge is cell-wise addition — commutative and
  * associative, so the merged sketch is partitioning-independent for
  * a given seed). The estimate is a plan lever only; it never reaches
  * the output. */
object CmsExprs {

  def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** `cms_estimate(item)` over a long column. */
  def estimate(cms: CountMinSketch)(item: Column): Column =
    Bridge.column(CmsEstimateExpr(Bridge.expression(item),
      SketchBytes(serialize(cms))))
}

/** See [[CmsExprs.estimate]]. The sketch cells ride as [[SketchBytes]]
  * (content equality) so two probes of the same sketch canonicalize
  * equal — reference-equality Array fields defeat plan-level CSE. */
case class CmsEstimateExpr(child: Expression, cmsBytes: SketchBytes)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_estimate needs BIGINT, got $t")
  }

  @transient private lazy val cms: CountMinSketch =
    CmsExprs.deserialize(cmsBytes.bytes)

  /** Public so generated code can call it via the reference object. */
  def est(item: Long): Long = cms.estimateCount(java.lang.Long.valueOf(item))

  override def nullSafeEval(input: Any): Any =
    est(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CmsEstimateExpr].getName)
    defineCodeGen(ctx, ev, v => s"$ref.est($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateExpr =
    copy(child = newChild)
}
