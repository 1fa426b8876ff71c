package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-sketch membership probe as a native codegen expression — the
  * index-COMPRESSION leg of the exact-dedup stack. A stored corpus
  * key index ([[graft.streaming.CurateStream]]'s `curate_keys`) is
  * linear in corpus size; the Bloom sketch of the same key set is
  * ~1.2 bytes per key at 1% false positives, and probing it is a
  * per-row bit test with NO join. Because a Bloom filter has no false
  * negatives, a gate that confirms only the might-contain candidates
  * against the real index produces EXACTLY the ungated answer — the
  * sketch buys away the join for the (at ingest, overwhelming)
  * novel-key majority without changing one output row.
  *
  * Built on Spark's public `org.apache.spark.util.sketch.BloomFilter`
  * (`Dataset.stat.bloomFilter` aggregates it distributedly;
  * merge = bitwise OR, so the bits are partitioning-independent and
  * deterministic for a given key set + (expectedItems, fpp)). The
  * serialized bits ride the expression as plan-time data — right up
  * to sketches of a few MB; past that (10^10-key corpora need ~12 GB
  * at 1% fpp) shard the sketch per key-range bucket and probe the
  * bucket's filter, as SCALE.md's sizing section lays out. */
object BloomExprs {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** `might_contain(bf, key)` over a string column. */
  def mightContain(bf: BloomFilter)(key: Column): Column =
    Bridge.column(BloomMightContainExpr(Bridge.expression(key),
      SketchBytes(serialize(bf))))

  /** [[mightContain]] from already-serialized bits — the per-shard
    * branch predicate of a shard-local gate (see
    * [[graft.ops.BloomGate.shardedGate]]); skips a deserialize +
    * re-serialize round-trip per shard. */
  def mightContainBytes(bytes: SketchBytes)(key: Column): Column =
    Bridge.column(BloomMightContainExpr(Bridge.expression(key), bytes))
}

/** See [[BloomExprs.mightContain]]. String keys probe via their UTF-8
  * bytes — the same bytes `stat.bloomFilter` inserted for a
  * StringType column, so probe and build hash identically. The bits
  * ride as [[SketchBytes]] (content equality) so two probes of the
  * same sketch canonicalize equal. */
case class BloomMightContainExpr(child: Expression, bfBytes: SketchBytes)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"might_contain needs STRING, got $t")
  }

  @transient private lazy val bf: BloomFilter = BloomExprs.deserialize(bfBytes.bytes)

  /** Public so generated code can call it via the reference object. */
  def test(s: UTF8String): Boolean = bf.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, v => s"$ref.test($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
