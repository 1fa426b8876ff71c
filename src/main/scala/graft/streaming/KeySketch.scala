package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}
import java.util.zip.CRC32

import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.util.sketch.BloomFilter

/** The maintained Bloom sketch of [[CurateStream]]'s content-key index
  * — an O(sketch)-size summary that lets each ingest settle its novel
  * keys with a per-row bit test instead of a semi-join against the
  * ever-growing `curate_keys` store (see [[graft.ops.BloomGate]] for
  * the exactness argument: the sketch has no false negatives, and
  * every sketch positive still pays the real confirm join, so gated
  * statuses are bit-identical to ungated ones).
  *
  * SHARDING (the 10^10-key shape, online): a monolithic filter at
  * 10^10 keys is ~12 GB — unbroadcastable, and every merge/rebuild
  * materializes the whole bitset in one place. The sketch therefore
  * holds S key-hash shards (S = 1 is the exact legacy monolith):
  * routing is `pmod(xxhash64(key_string), S)` — the SAME hash the
  * gate's per-shard branches ([[Sketch.gate]]) and the batch-side
  * grouped builds use, so build, merge, rebuild and
  * probe always agree on which shard owns a key. Each shard keeps its
  * OWN (capacity, items) pair: merges update only the shards the
  * batch touches, and saturation REBUILDS only the shards whose
  * items crossed their capacity — never the whole sketch. PROBING is
  * shard-local too ([[Sketch.gate]]): the gate plans one branch per
  * shard, each carrying only its own filter bytes, so no task ever
  * materializes the full sketch — the 10^10-key claim holds for
  * serving memory, not just maintenance locality. Exactness
  * is untouched: routing is deterministic and each shard has no false
  * negatives over its own keys, so the union gate admits every true
  * duplicate and the confirm join still decides (KeySketchSpec pins
  * sharded ≡ monolithic ≡ ungated through ingest, saturation rebuild
  * and crash replay).
  *
  * INVARIANT (the one that matters): the sketch is a SUPERSET of the
  * stored key set at all times — per shard. Everything is ordered
  * around it:
  *
  *  - per batch, the sketch merge lands BEFORE the `curate_keys`
  *    upsert (sketch ⊇ keys through every crash window; a sketch
  *    updated for keys that never landed just carries extra false
  *    positives, which the confirm join eats);
  *  - merges are bitwise-OR idempotent, so foreachBatch replay
  *    re-merges harmlessly;
  *  - the batch's own filters are built with each stored shard's
  *    exact creation parameters — the SAME (expectedItems, fpp) pair,
  *    which reproduces both numBits and numHashFunctions, hence a
  *    mergeable geometry. (Deriving the batch side from `bitSize()`
  *    instead is a trap: BitArray rounds bits up to a 64-bit word
  *    multiple, so `create(cap, bitSize)` can land on a different
  *    optimal hash count than `create(cap, fpp)` did and
  *    `mergeInPlace` throws IncompatibleMergeException —
  *    KeySketchSpec pins the repro and the fix across small
  *    capacities.) That is why fpp and the per-shard capacities are
  *    persisted in the header, not treated as call-site defaults;
  *  - the file swap is rename-based: write `.tmp`, park the old file
  *    aside, promote, delete the parked copy. At every crash point
  *    either the old or the new (superset) sketch is recoverable;
  *  - the on-disk image is self-validating (CRC32 trailer over the
  *    whole payload): a torn FIRST-ever write — the one crash window
  *    with no parked copy to roll back to — is detected on read,
  *    deleted, and reported as absent, so ingest degrades to the
  *    ungated (still-exact) semi-join instead of failing permanently.
  *    Only VALIDATION failures (CRC/magic/length/deserialize) discard
  *    the file; a transient IO error reports absent WITHOUT deleting,
  *    so bit rot is the only thing that costs the gate — and both
  *    paths log the event. The sketch is derived data; the
  *    authoritative `curate_keys` store rebuilds it at the next
  *    maintenance window.
  *
  * CAPACITY: a Bloom filter's fpp degrades as inserts exceed its
  * sizing. Each shard's header tracks (capacity, itemsMerged); when a
  * shard's itemsMerged crosses its capacity, [[maybeRebuild]] rebuilds
  * THAT shard at 4× from the authoritative `curate_keys` store — one
  * routed scan of the key store covering all saturated shards,
  * amortized exactly like [[graft.sinks.Layout.compactStatic]] windows
  * (wire it to the same cadence). fpp is a COST knob only: a saturated
  * sketch admits more candidates to the confirm join but never a
  * wrong row. */
object KeySketch {

  val DefaultFpp = 0.01

  /** Header version: "GSK4" — shard count, fpp, then per shard
    * (capacity, items, length-prefixed filter bytes), CRC32 trailer.
    * A GSK2-era monolithic image (capacity, items, fpp,
    * length-prefixed filter bytes) is still READ — as a 1-shard
    * sketch — so upgrading a live store never silently drops its gate
    * (the old failure mode: magic mismatch → "corrupt" → deleted →
    * permanently ungated, because [[maybeRebuild]] is a no-op on an
    * absent sketch). The next [[write]] persists it as GSK4. */
  private val Magic = 0x47534b34
  private val Gsk2Magic = 0x47534b32

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def file(root: String) = new Path(s"$root/static/curate_sketch.bin")
  private def tmp(root: String) = new Path(s"$root/static/.curate_sketch.tmp")
  private def old(root: String) = new Path(s"$root/static/.curate_sketch.old")

  final case class Shard(capacity: Long, items: Long, bf: BloomFilter)

  final case class Sketch(fpp: Double, shards: IndexedSeq[Shard]) {
    def shardCount: Int = shards.length
    def capacity: Long = shards.map(_.capacity).sum
    def items: Long = shards.map(_.items).sum
    def numBits: Long = shards.map(_.bf.bitSize()).sum
    /** The gate — the rows of `df` whose `keyCol` the sketch might
      * contain (per-row bit test; no false negatives — see object
      * doc). For S > 1 the plan is SHARD-LOCAL: a union of S
      * branches, branch i filtering `pmod(xxhash64(key), S) = i AND
      * might_contain(shard_i)`, so each branch's task closure carries
      * ONLY shard i's filter bytes and per-task executor memory is
      * one shard — never the whole sketch (the property that makes
      * the 10^10-key sharding hold for PROBING, not just merge/
      * rebuild locality; a single Column predicate can't express
      * this, which is why the gate takes the frame). Routing is the
      * build's own hash, so every key tests against exactly the shard
      * that owns it; the branches partition the rows, so the union
      * adds no duplicates and loses none. KeySketchSpec asserts the
      * one-image-per-branch plan shape. */
    def gate(df: DataFrame, keyCol: String): DataFrame =
      if (shards.length == 1)
        df.where(graft.functions.BloomExprs.mightContain(shards.head.bf)(
          col(keyCol).cast("string")))
      else
        shards.zipWithIndex.map { case (sh, i) =>
          df.where(shardOf(keyCol, shards.length) === i &&
            graft.functions.BloomExprs.mightContain(sh.bf)(
              col(keyCol).cast("string")))
        }.reduce(_ unionByName _)
  }

  /** Monolithic constructor — the S = 1 shape most callers and the
    * pre-shard specs use. */
  def monolithic(capacity: Long, items: Long, fpp: Double,
      bf: BloomFilter): Sketch =
    Sketch(fpp, IndexedSeq(Shard(capacity, items, bf)))

  private def copyOf(bf: BloomFilter): BloomFilter = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    BloomFilter.readFrom(new ByteArrayInputStream(bos.toByteArray))
  }

  /** The build/merge/rebuild/probe routing column: xxhash64 (seed 42)
    * of the key's STRING value — [[Sketch.gate]]'s branch predicates
    * use the same column, so a key always tests against the shard the
    * build put it in. The cast runs on both sides so a non-string key
    * column can never route differently than it probes. */
  private def shardOf(keyCol: String, shards: Int): Column =
    pmod(xxhash64(col(keyCol).cast("string")), lit(shards)).cast("int")

  /** Grouped shard build over (a subset of) the key frame: each
    * shard's filter is filled on the executor that owns its shuffle
    * partition (no driver-side bitset merge; filter bits are an OR of
    * per-key insertions — insertion-order independent, hence
    * deterministic given the routing). Returns (shard → (exactCount,
    * filter)); shards with no keys are simply absent. `capFor` gives
    * each shard's creation capacity — the geometry the header
    * persists. */
  private def buildGrouped(keys: DataFrame, keyCol: String, shards: Int,
      capFor: Int => Long, fpp: Double,
      onlyShards: Option[Set[Int]] = None): Map[Int, (Long, BloomFilter)] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val caps = (0 until shards).map(capFor)
    val routed = keys
      .select(shardOf(keyCol, shards).as("s"),
        col(keyCol).cast("string").as("k"))
    val scoped = onlyShards match {
      case Some(t) => routed.where(col("s").isin(t.toSeq: _*))
      case None => routed
    }
    scoped.as[(Int, String)]
      .groupByKey(_._1)
      .mapGroups { (sh, it) =>
        val bf = BloomFilter.create(caps(sh), fpp)
        var n = 0L
        it.foreach { t =>
          bf.putBinary(t._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          n += 1
        }
        (sh, n, graft.functions.BloomExprs.serialize(bf))
      }
      .collect()
      .map { case (sh, n, b) =>
        sh -> (n, graft.functions.BloomExprs.deserialize(b))
      }
      .toMap
  }

  /** Read the sketch, recovering from an interrupted swap: a complete
    * `.tmp` with no promoted file is the newest (superset) copy;
    * otherwise a parked `.old` from a crash after promotion cleanup
    * failure is stale and removable. A file that fails VALIDATION
    * (CRC, magic, structural lengths — a torn first-ever write, bit
    * rot) is DELETED and reported absent; a transient IO failure is
    * reported absent WITHOUT deleting (the healthy image survives for
    * the next read). Both are logged. Callers fall back to the
    * ungated path either way and the next bootstrap/rebuild recreates
    * the sketch. */
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
    // IO phase: transient failures must NOT destroy a healthy image
    val bytes =
      try {
        val len = f.getFileStatus(dst).getLen
        // structural sanity that needs no payload read: too-short and
        // absurdly large (> Int.MaxValue would overflow the buffer
        // alloc below) are validation failures, not IO ones
        if (len < 4 + 4 + 8 + 8 || len > Int.MaxValue.toLong) {
          log.warn(s"discarding sketch $dst: implausible length $len B")
          f.delete(dst, false)
          return None
        }
        val b = new Array[Byte](len.toInt)
        val in = f.open(dst)
        try in.readFully(0L, b) finally in.close()
        b
      } catch {
        case NonFatal(e) =>
          log.warn(s"sketch read failed under $root (kept on disk): $e")
          return None
      }
    // validation phase: any failure here means the image itself is bad
    try {
      val crc = new CRC32()
      crc.update(bytes, 0, bytes.length - 8)
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.getLong(bytes.length - 8) == crc.getValue, "sketch CRC mismatch")
      val magic = buf.getInt()
      if (magic == Gsk2Magic) {
        // pre-shard image: capacity, items, fpp, one length-prefixed
        // filter — a valid 1-shard sketch, not corruption. Parse it as
        // the monolith it is; the next write() re-persists as GSK4.
        val capacity = buf.getLong()
        val items = buf.getLong()
        val fpp = buf.getDouble()
        val bfLen = buf.getInt()
        require(bfLen == bytes.length - buf.position() - 8,
          "sketch length mismatch")
        val bf = BloomFilter.readFrom(
          new ByteArrayInputStream(bytes, buf.position(), bfLen))
        log.info(s"read GSK2 monolithic sketch under $root as 1-shard")
        return Some(monolithic(capacity, items, fpp, bf))
      }
      require(magic == Magic, "sketch magic mismatch")
      val s = buf.getInt()
      require(s >= 1 && s <= (1 << 20), s"implausible shard count $s")
      val fpp = buf.getDouble()
      val shards = (0 until s).map { _ =>
        val capacity = buf.getLong()
        val items = buf.getLong()
        val bfLen = buf.getInt()
        require(bfLen >= 0 && bfLen <= bytes.length - buf.position() - 8,
          "sketch shard length mismatch")
        val bf = BloomFilter.readFrom(
          new ByteArrayInputStream(bytes, buf.position(), bfLen))
        buf.position(buf.position() + bfLen)
        Shard(capacity, items, bf)
      }
      require(buf.position() == bytes.length - 8, "sketch trailing bytes")
      Some(Sketch(fpp, shards))
    } catch {
      case NonFatal(e) =>
        // derived data: discard the corrupt image so every later read
        // degrades cleanly instead of re-throwing forever
        log.warn(s"discarding corrupt sketch under $root: $e")
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
      d.writeInt(s.shards.length)
      d.writeDouble(s.fpp)
      s.shards.foreach { sh =>
        d.writeLong(sh.capacity)
        d.writeLong(sh.items)
        val bfb = graft.functions.BloomExprs.serialize(sh.bf)
        d.writeInt(bfb.length)
        d.write(bfb)
      }
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
    * ingest headroom before its first saturation rebuild. `shards = 1`
    * builds the monolith via the distributed `stat.bloomFilter`
    * aggregate; `shards > 1` builds grouped, one filter per key-hash
    * shard with capacity/items tracked per shard. */
  def build(keys: DataFrame, keyCol: String, capacity: Long,
      fpp: Double = DefaultFpp, shards: Int = 1): Sketch = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val n = keys.count()
    val cap = math.max(capacity, math.max(2 * n, shards.toLong))
    if (shards == 1)
      monolithic(cap, n, fpp, keys.stat.bloomFilter(keyCol, cap, fpp))
    else {
      val perCap = math.max(cap / shards, 1L)
      val built = buildGrouped(keys, keyCol, shards, _ => perCap, fpp)
      Sketch(fpp, (0 until shards).map { i =>
        built.get(i) match {
          case Some((cnt, bf)) => Shard(perCap, cnt, bf)
          case None => Shard(perCap, 0L, BloomFilter.create(perCap, fpp))
        }
      })
    }
  }

  /** OR-merge a batch's keys into the stored sketch. The batch side
    * builds with each stored shard's exact creation parameters (see
    * object doc — merge geometry), then ORs shard-wise; only shards
    * the batch touches change, and per-shard item counts advance by
    * the exact routed counts. Returns a NEW sketch owning its own
    * bits — the caller's `stored` is left untouched, so a pre-merge
    * Sketch held for later evaluation keeps its pre-merge contents.
    * Caller writes the result BEFORE upserting the keys it covers.
    * `knownCount >= 0` supplies the batch-key count when the caller
    * already holds it (the curate ingest's one manifest collect),
    * eliding the count job on the monolithic path (the sharded path
    * learns its exact per-shard counts from the grouped build
    * itself). */
  def merge(stored: Sketch, batchKeys: DataFrame, keyCol: String,
      knownCount: Long = -1L): Sketch =
    if (stored.shardCount == 1) {
      val n = if (knownCount >= 0) knownCount else batchKeys.count()
      if (n == 0) stored
      else {
        val sh = stored.shards.head
        // identical (expectedItems, fpp) ⇒ identical numBits AND
        // numHashFunctions; building from bitSize() instead re-rounds
        // the word-aligned bit count and can flip the optimal hash
        // count (the IncompatibleMergeException trap)
        val batchBf =
          batchKeys.stat.bloomFilter(keyCol, sh.capacity, stored.fpp)
        val merged = copyOf(sh.bf)
        merged.mergeInPlace(batchBf)
        Sketch(stored.fpp,
          IndexedSeq(Shard(sh.capacity, sh.items + n, merged)))
      }
    } else {
      val built = buildGrouped(batchKeys, keyCol, stored.shardCount,
        i => stored.shards(i).capacity, stored.fpp)
      if (built.isEmpty) stored
      else Sketch(stored.fpp, stored.shards.zipWithIndex.map {
        case (sh, i) =>
          built.get(i) match {
            case Some((cnt, bf)) =>
              val merged = copyOf(sh.bf)
              merged.mergeInPlace(bf)
              Shard(sh.capacity, sh.items + cnt, merged)
            case None => sh
          }
      })
    }

  /** Rebuild each SATURATED shard (items > capacity) at 4× its
    * capacity from the authoritative key store — one routed scan
    * covering all saturated shards; healthy shards keep their bits
    * and counters untouched. The saturation maintenance window (pair
    * with the compaction cadence). The stored sketch's own fpp is
    * sticky across rebuilds. Returns true if any shard rebuilt. */
  def maybeRebuild(spark: SparkSession, root: String, allKeys: DataFrame,
      keyCol: String): Boolean =
    read(spark, root) match {
      case Some(s) =>
        val saturated = s.shards.zipWithIndex
          .collect { case (sh, i) if sh.items > sh.capacity => i }.toSet
        if (saturated.isEmpty) false
        else if (s.shardCount == 1) {
          write(spark, root,
            build(allKeys, keyCol, s.capacity * 4, s.fpp))
          true
        } else {
          // per-shard 4× capacities for the saturated set, floored at
          // 2× the shard's merged-item count (build()'s headroom rule;
          // items ≥ true key count, so one rebuild always de-saturates)
          // — the grouped pass routes the key store once and fills
          // only those shards
          val newCap = (i: Int) =>
            if (saturated(i))
              math.max(math.max(s.shards(i).capacity * 4,
                2 * s.shards(i).items), 1L)
            else s.shards(i).capacity
          val rebuilt = buildGrouped(allKeys, keyCol, s.shardCount,
            newCap, s.fpp, Some(saturated))
          write(spark, root, Sketch(s.fpp, s.shards.zipWithIndex.map {
            case (sh, i) =>
              if (!saturated(i)) sh
              else rebuilt.get(i) match {
                case Some((cnt, bf)) => Shard(newCap(i), cnt, bf)
                case None =>
                  Shard(newCap(i), 0L,
                    BloomFilter.create(newCap(i), s.fpp))
              }
          }))
          true
        }
      case None => false
    }
}
