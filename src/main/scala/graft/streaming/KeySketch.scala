package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}
import java.util.zip.CRC32

import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** The maintained Bloom sketch of [[CurateStream]]'s content-key index
  * — an O(sketch)-size summary that lets each ingest settle its novel
  * keys with a per-row bit test instead of a semi-join against the
  * ever-growing `curate_keys` store (see [[graft.ops.BloomGate]] for
  * the exactness argument: the sketch has no false negatives, and
  * every sketch positive still pays the real confirm join, so gated
  * statuses are bit-identical to ungated ones).
  *
  * INVARIANT (the one that matters): the sketch is a SUPERSET of the
  * stored key set at all times. Everything is ordered around it:
  *
  *  - per batch, the sketch merge lands BEFORE the `curate_keys`
  *    upsert (sketch ⊇ keys through every crash window; a sketch
  *    updated for keys that never landed just carries extra false
  *    positives, which the confirm join eats);
  *  - merges are bitwise-OR idempotent, so foreachBatch replay
  *    re-merges harmlessly;
  *  - the batch's own sketch is built DISTRIBUTED: `stat.bloomFilter`
  *    with the stored sketch's exact creation parameters — the SAME
  *    (expectedItems, fpp) pair, which reproduces both numBits and
  *    numHashFunctions, hence a mergeable geometry. (Deriving the
  *    batch side from `bitSize()` instead is a trap: BitArray rounds
  *    bits up to a 64-bit word multiple, so `create(cap, bitSize)`
  *    can land on a different optimal hash count than
  *    `create(cap, fpp)` did and `mergeInPlace` throws
  *    IncompatibleMergeException — KeySketchSpec pins the repro and
  *    the fix across small capacities.) That is why fpp is persisted
  *    in the sketch header, not treated as a call-site default;
  *  - the file swap is rename-based: write `.tmp`, park the old file
  *    aside, promote, delete the parked copy. At every crash point
  *    either the old or the new (superset) sketch is recoverable;
  *  - the on-disk image is self-validating (CRC32 trailer over the
  *    whole payload): a torn FIRST-ever write — the one crash window
  *    with no parked copy to roll back to — is detected on read,
  *    deleted, and reported as absent, so ingest degrades to the
  *    ungated (still-exact) semi-join instead of failing permanently.
  *    The sketch is derived data; the authoritative `curate_keys`
  *    store rebuilds it at the next maintenance window.
  *
  * CAPACITY: a Bloom filter's fpp degrades as inserts exceed its
  * sizing. The meta header tracks (capacity, itemsMerged); when
  * itemsMerged crosses capacity, [[maybeRebuild]] rebuilds at 4× from
  * the authoritative `curate_keys` store — a full index scan, amortized
  * exactly like [[graft.sinks.Layout.compactStatic]] windows (wire it
  * to the same cadence). fpp is a COST knob only: a saturated sketch
  * admits more candidates to the confirm join but never a wrong row. */
object KeySketch {

  val DefaultFpp = 0.01

  /** Header version: "GSK2" — capacity, items, fpp, length-prefixed
    * filter bytes, CRC32 trailer. */
  private val Magic = 0x47534b32

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def file(root: String) = new Path(s"$root/static/curate_sketch.bin")
  private def tmp(root: String) = new Path(s"$root/static/.curate_sketch.tmp")
  private def old(root: String) = new Path(s"$root/static/.curate_sketch.old")

  final case class Sketch(capacity: Long, items: Long, fpp: Double,
      bf: BloomFilter) {
    def numBits: Long = bf.bitSize()
    /** The gate predicate — per-row bit test against the broadcast
      * filter (no false negatives; see object doc). */
    def mightContain(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      graft.functions.BloomExprs.mightContain(bf)(c)
  }

  private def copyOf(bf: BloomFilter): BloomFilter = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    BloomFilter.readFrom(new ByteArrayInputStream(bos.toByteArray))
  }

  /** Read the sketch, recovering from an interrupted swap: a complete
    * `.tmp` with no promoted file is the newest (superset) copy;
    * otherwise a parked `.old` from a crash after promotion cleanup
    * failure is stale and removable. A file that fails its CRC or
    * deserialize (torn first-ever write, bit rot) is DELETED and
    * reported absent — callers fall back to the ungated path and the
    * next bootstrap/rebuild recreates the sketch. */
  def read(spark: SparkSession, root: String): Option[Sketch] = {
    val f = fs(spark, root)
    val dst = file(root)
    if (!f.exists(dst)) {
      // crash between park and promote: .tmp is the complete new copy
      if (f.exists(tmp(root))) {
        if (!f.rename(tmp(root), dst)) return None
      } else if (f.exists(old(root))) {
        // crash between park and tmp-promote with tmp lost is
        // impossible (tmp is written before park); a lone .old means
        // the promote itself was lost — roll the parked copy back
        if (!f.rename(old(root), dst)) return None
      } else return None
    }
    if (f.exists(old(root))) f.delete(old(root), false)
    if (f.exists(tmp(root))) f.delete(tmp(root), false)
    try {
      val len = f.getFileStatus(dst).getLen
      require(len >= 4 + 8 + 8 + 8 + 4 + 8, s"sketch file truncated ($len B)")
      val bytes = new Array[Byte](len.toInt)
      val in = f.open(dst)
      try in.readFully(0L, bytes) finally in.close()
      val crc = new CRC32()
      crc.update(bytes, 0, bytes.length - 8)
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.getLong(bytes.length - 8) == crc.getValue, "sketch CRC mismatch")
      require(buf.getInt() == Magic, "sketch magic mismatch")
      val capacity = buf.getLong()
      val items = buf.getLong()
      val fpp = buf.getDouble()
      val bfLen = buf.getInt()
      require(bfLen == bytes.length - buf.position() - 8, "sketch length mismatch")
      val bf = BloomFilter.readFrom(
        new ByteArrayInputStream(bytes, buf.position(), bfLen))
      Some(Sketch(capacity, items, fpp, bf))
    } catch {
      case NonFatal(_) =>
        // derived data: discard the corrupt image so every later read
        // degrades cleanly instead of re-throwing forever
        f.delete(dst, false)
        None
    }
  }

  /** Rename-swap write; see object doc for the crash windows. */
  def write(spark: SparkSession, root: String, s: Sketch): Unit = {
    val f = fs(spark, root)
    f.mkdirs(file(root).getParent)
    val payload = {
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.writeInt(Magic)
      d.writeLong(s.capacity)
      d.writeLong(s.items)
      d.writeDouble(s.fpp)
      val bfb = { val b = new ByteArrayOutputStream(); s.bf.writeTo(b); b.toByteArray }
      d.writeInt(bfb.length)
      d.write(bfb)
      d.flush()
      bos.toByteArray
    }
    val crc = new CRC32()
    crc.update(payload)
    val out = f.create(tmp(root), true)
    try {
      out.write(payload)
      out.writeLong(crc.getValue)
    } finally out.close()
    if (f.exists(file(root))) {
      if (f.exists(old(root))) f.delete(old(root), false)
      if (!f.rename(file(root), old(root)))
        throw new java.io.IOException(s"sketch park failed under $root")
    }
    if (!f.rename(tmp(root), file(root)))
      throw new java.io.IOException(s"sketch promote failed under $root")
    if (f.exists(old(root))) f.delete(old(root), false)
  }

  /** Fresh sketch over a key frame (bootstrap / rebuild) — sized to at
    * least 2× the current key count so a freshly built sketch has
    * ingest headroom before its first saturation rebuild. */
  def build(keys: DataFrame, keyCol: String, capacity: Long,
      fpp: Double = DefaultFpp): Sketch = {
    val n = keys.count()
    val cap = math.max(capacity, math.max(2 * n, 1L))
    Sketch(cap, n, fpp, keys.stat.bloomFilter(keyCol, cap, fpp))
  }

  /** OR-merge a batch's keys into the stored sketch (distributed: the
    * batch side builds with the stored sketch's exact creation
    * parameters, then the two bitsets OR on the driver). Returns a
    * NEW sketch owning its own bits — the caller's `stored` is left
    * untouched, so a pre-merge Sketch held for later evaluation keeps
    * its pre-merge contents. Caller writes the result BEFORE
    * upserting the keys it covers. `knownCount >= 0` supplies the
    * batch-key count when the caller already holds it (the curate
    * ingest's one manifest collect), eliding the count job. */
  def merge(stored: Sketch, batchKeys: DataFrame, keyCol: String,
      knownCount: Long = -1L): Sketch = {
    val n = if (knownCount >= 0) knownCount else batchKeys.count()
    if (n == 0) return stored
    // identical (expectedItems, fpp) ⇒ identical numBits AND
    // numHashFunctions; building from bitSize() instead re-rounds the
    // word-aligned bit count and can flip the optimal hash count (see
    // object doc — the IncompatibleMergeException trap)
    val batchBf = batchKeys.stat.bloomFilter(keyCol, stored.capacity, stored.fpp)
    val merged = copyOf(stored.bf)
    merged.mergeInPlace(batchBf)
    Sketch(stored.capacity, stored.items + n, stored.fpp, merged)
  }

  /** Rebuild at 4× capacity from the authoritative key store once
    * merged items cross capacity — the saturation maintenance window
    * (pair with the compaction cadence). The stored sketch's own fpp
    * is sticky across rebuilds. Returns true if rebuilt. */
  def maybeRebuild(spark: SparkSession, root: String, allKeys: DataFrame,
      keyCol: String): Boolean =
    read(spark, root) match {
      case Some(s) if s.items > s.capacity =>
        write(spark, root, build(allKeys, keyCol, s.capacity * 4, s.fpp))
        true
      case _ => false
    }
}
