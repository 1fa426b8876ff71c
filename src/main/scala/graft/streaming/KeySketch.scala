package graft.streaming

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
  *  - the batch's own sketch is built DISTRIBUTED
  *    (`stat.bloomFilter` with the stored sketch's exact geometry —
  *    same expectedItems + numBits ⇒ mergeable) and OR'd in; no
  *    driver-side key loop;
  *  - the file swap is rename-based: write `.tmp`, park the old file
  *    aside, promote, delete the parked copy. At every crash point
  *    either the old or the new (superset) sketch is recoverable.
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

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def file(root: String) = new Path(s"$root/static/curate_sketch.bin")
  private def tmp(root: String) = new Path(s"$root/static/.curate_sketch.tmp")
  private def old(root: String) = new Path(s"$root/static/.curate_sketch.old")

  final case class Sketch(capacity: Long, items: Long, bf: BloomFilter) {
    def numBits: Long = bf.bitSize()
  }

  /** Read the sketch, recovering from an interrupted swap: a complete
    * `.tmp` with no promoted file is the newest (superset) copy;
    * otherwise a parked `.old` from a crash after promotion cleanup
    * failure is stale and removable. */
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
    val in = f.open(dst)
    try {
      val capacity = in.readLong()
      val items = in.readLong()
      Some(Sketch(capacity, items, BloomFilter.readFrom(in)))
    } finally in.close()
  }

  /** Rename-swap write; see object doc for the crash windows. */
  def write(spark: SparkSession, root: String, s: Sketch): Unit = {
    val f = fs(spark, root)
    f.mkdirs(file(root).getParent)
    val out = f.create(tmp(root), true)
    try {
      out.writeLong(s.capacity)
      out.writeLong(s.items)
      s.bf.writeTo(out)
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
    Sketch(cap, n, keys.stat.bloomFilter(keyCol, cap, fpp))
  }

  /** OR-merge a batch's keys into the stored sketch (distributed: the
    * batch side builds with the SAME geometry, then the two bitsets
    * OR on the driver). Returns the merged sketch; caller writes it
    * BEFORE upserting the keys it covers. */
  def merge(stored: Sketch, batchKeys: DataFrame, keyCol: String): Sketch = {
    val n = batchKeys.count()
    if (n == 0) return stored
    val batchBf = batchKeys.stat.bloomFilter(keyCol, stored.capacity,
      stored.numBits)
    stored.bf.mergeInPlace(batchBf)
    Sketch(stored.capacity, stored.items + n, stored.bf)
  }

  /** Rebuild at 4× capacity from the authoritative key store once
    * merged items cross capacity — the saturation maintenance window
    * (pair with the compaction cadence). Returns true if rebuilt. */
  def maybeRebuild(spark: SparkSession, root: String, allKeys: DataFrame,
      keyCol: String, fpp: Double = DefaultFpp): Boolean =
    read(spark, root) match {
      case Some(s) if s.items > s.capacity =>
        write(spark, root, build(allKeys, keyCol, s.capacity * 4, fpp))
        true
      case _ => false
    }
}
