package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sinks.Layout

/** The maintained-sketch contract ([[KeySketch]] + the gated exact
  * layer in [[CurateStream.ingestBatch]]): gating is a pure plan
  * optimization — statuses bit-identical to the ungated path through
  * sequential ingest, replay, crash-window supersets, and sketch
  * saturation + rebuild. */
class KeySketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def qtext(k: Int): String = {
    val stop = Seq("the", "a", "of", "and", "to")
    (0 until 45).flatMap(i =>
      if (i % 9 == 0) Seq(stop(i / 9), s"w${k}_$i") else Seq(s"w${k}_$i"))
      .mkString(" ")
  }

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(length(text) AS INT) AS n_chars")
  }

  private def corpus = docsDF(Seq(
    1L -> qtext(1), 2L -> (qtext(3) + " tail3"), 29L -> qtext(6)))
  private def batchA = docsDF(Seq(
    0L -> qtext(1), 10L -> qtext(2), 40L -> qtext(8)))
  private def batchB = docsDF(Seq(
    5L -> qtext(2), 15L -> qtext(3), 35L -> "just three tokens"))

  private def manifests(root: String) = {
    val s = spark
    import s.implicits._
    Layout.readStatic(s, root, CurateStream.ManifestEntity).get
      .select("doc_id", "status").as[(Long, String)].collect().toMap
  }

  test("sketch-gated ingest produces bit-identical statuses to ungated") {
    val gatedRoot = graft.Temps.dir("sketch-gated")
    val plainRoot = graft.Temps.dir("sketch-plain")
    CurateStream.bootstrap(corpus, gatedRoot, withSketch = true)
    CurateStream.bootstrap(corpus, plainRoot)
    assert(KeySketch.read(spark, gatedRoot).isDefined)
    assert(KeySketch.read(spark, plainRoot).isEmpty)
    for (root <- Seq(gatedRoot, plainRoot)) {
      CurateStream.ingestBatch(batchA, root).unpersist()
      CurateStream.ingestBatch(batchB, root).unpersist()
    }
    val gated = manifests(gatedRoot)
    assert(gated === manifests(plainRoot))
    // the scenario exercises the gate both ways: corpus dups (sketch
    // positives that confirm) and novel keys (settled without joining)
    assert(gated(0L) === "dup_exact_corpus")
    assert(gated(5L) === "dup_exact_corpus") // kept-in-A twin of 10
    assert(gated(40L) === "kept")
    // sketch item accounting: corpus 3 + kept of A (10, 40) + kept of
    // B (none — all three rows drop)
    val sk = KeySketch.read(spark, gatedRoot).get
    assert(sk.items === 3L + 2L + 0L)
  }

  test("replayed batch re-merges the sketch harmlessly (statuses stable)") {
    val root = graft.Temps.dir("sketch-replay")
    CurateStream.bootstrap(corpus, root, withSketch = true)
    CurateStream.ingestBatch(batchA, root).unpersist()
    val before = manifests(root)
    val itemsBefore = KeySketch.read(spark, root).get.items
    // foreachBatch replay: same batch again — its own keys sit in the
    // sketch (positives), but the id-excluded confirm rejects them
    val replayed = CurateStream.ingestBatch(batchA, root)
    val s = spark
    import s.implicits._
    assert(replayed.select("doc_id", "status")
      .as[(Long, String)].collect().toMap === before)
    replayed.unpersist()
    // the re-merge double-counts items (OR of identical bits) — pure
    // accounting conservatism, only ever hastens the rebuild window
    assert(KeySketch.read(spark, root).get.items >= itemsBefore)
  }

  test("crash-window superset: sketch with unlanded keys stays exact") {
    val root = graft.Temps.dir("sketch-superset")
    CurateStream.bootstrap(corpus, root, withSketch = true)
    // simulate a batch whose sketch merge landed but whose keys upsert
    // (and manifest) died: merge batchA's keys in by hand, land nothing
    val sk = KeySketch.read(spark, root).get
    KeySketch.write(spark, root, KeySketch.merge(sk,
      batchA.select(md5(col("text").cast("binary")).as("key")), "key"))
    // the retried ingest must classify exactly as a clean one: doc 0 is
    // a real corpus dup; 10/40's keys are sketch false-positives that
    // the confirm join rejects
    val got = CurateStream.ingestBatch(batchA, root)
    val s = spark
    import s.implicits._
    val m = got.select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(m === Map(0L -> "dup_exact_corpus", 10L -> "kept", 40L -> "kept"))
    got.unpersist()
  }

  test("saturation rebuild: 4x capacity from the key store, gate still exact") {
    val root = graft.Temps.dir("sketch-rebuild")
    CurateStream.bootstrap(corpus, root, withSketch = true)
    CurateStream.ingestBatch(batchA, root).unpersist()
    // force saturation: shrink the recorded capacity below items
    val sk = KeySketch.read(spark, root).get
    KeySketch.write(spark, root,
      KeySketch.Sketch(sk.fpp, sk.shards.map(_.copy(capacity = 1L))))
    val keys = Layout.readStatic(spark, root, CurateStream.KeysEntity).get
    assert(KeySketch.maybeRebuild(spark, root, keys.select("key"), "key"))
    val rebuilt = KeySketch.read(spark, root).get
    // 4× the saturated capacity, floored at build()'s 2×-keys headroom
    assert(rebuilt.capacity === math.max(4L, 2L * keys.count()))
    assert(rebuilt.items === keys.count())
    assert(!KeySketch.maybeRebuild(spark, root, keys.select("key"), "key"))
    // post-rebuild ingest still classifies exactly
    val got = CurateStream.ingestBatch(batchB, root)
    val s = spark
    import s.implicits._
    val m = got.select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(m === Map(5L -> "dup_exact_corpus", 15L -> "dup_near_corpus",
      35L -> "low_quality"))
    got.unpersist()
  }

  test("merge geometry: fpp-derived batch side is mergeable at every capacity") {
    val s = spark
    import s.implicits._
    import org.apache.spark.util.sketch.BloomFilter
    // the r7 trap, kept as documentation: deriving the batch filter
    // from the stored bitSize() re-rounds the word-aligned bit count,
    // which can flip optimalNumOfHashFunctions — mergeInPlace then
    // throws IncompatibleMergeException. Small capacities reproduce it.
    val caps = Seq(1L, 2L, 4L, 8L, 10L, 100L, 1000L)
    val bitDerivedFailures = caps.count { cap =>
      val a = BloomFilter.create(cap, KeySketch.DefaultFpp)
      val b = BloomFilter.create(cap, a.bitSize())
      scala.util.Try(a.mergeInPlace(b)).isFailure
    }
    assert(bitDerivedFailures > 0) // the hazard is real on this Spark
    // the fix: merge() builds the batch side from the PERSISTED
    // (capacity, fpp) pair — identical geometry at every capacity
    for (cap <- caps) {
      val stored = KeySketch.monolithic(cap, 1L, KeySketch.DefaultFpp,
        Seq("ka").toDF("key").stat.bloomFilter("key", cap, KeySketch.DefaultFpp))
      val merged = KeySketch.merge(stored, Seq("kb").toDF("key"), "key")
      assert(merged.items === 2L)
      assert(merged.shards.head.bf.mightContainBinary("ka".getBytes("UTF-8")))
      assert(merged.shards.head.bf.mightContainBinary("kb".getBytes("UTF-8")))
    }
  }

  test("merge returns a sketch owning its bits; the caller's is unmutated") {
    val s = spark
    import s.implicits._
    def bits(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] =
      graft.functions.BloomExprs.serialize(bf)
    val stored = KeySketch.build(Seq("ka").toDF("key"), "key", capacity = 64L)
    val before = bits(stored.shards.head.bf)
    val merged = KeySketch.merge(stored, Seq("kb").toDF("key"), "key")
    // a caller that held the pre-merge Sketch for later evaluation
    // sees its original contents, not silently-OR'd bits
    assert(java.util.Arrays.equals(bits(stored.shards.head.bf), before))
    assert(!java.util.Arrays.equals(bits(merged.shards.head.bf), before))
    assert(merged.shards.head.bf.mightContainBinary("ka".getBytes("UTF-8")))
    assert(merged.shards.head.bf.mightContainBinary("kb".getBytes("UTF-8")))
  }

  test("torn write: corrupt image is discarded; ingest degrades to ungated") {
    val fsOf = (root: String) => new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plant(root: String, name: String, bytes: Array[Byte]): Unit = {
      val fs = fsOf(root)
      val p = new org.apache.hadoop.fs.Path(s"$root/static/$name")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      try out.write(bytes) finally out.close()
    }
    // (a) torn FIRST-ever write: a lone partial .tmp, nothing to roll
    // back to — read() promotes it, fails validation, deletes it, and
    // reports absent instead of throwing on every subsequent read
    val r1 = graft.Temps.dir("sketch-torn-first")
    plant(r1, ".curate_sketch.tmp", Array.fill[Byte](12)(0x5a))
    assert(KeySketch.read(spark, r1).isEmpty)
    assert(!fsOf(r1).exists(
      new org.apache.hadoop.fs.Path(s"$r1/static/curate_sketch.bin")))
    assert(KeySketch.read(spark, r1).isEmpty) // stays absent, no throw
    // (b) torn LIVE file mid-pipeline: the gated store degrades to the
    // ungated semi-join with bit-identical statuses
    val gatedRoot = graft.Temps.dir("sketch-torn-live")
    val plainRoot = graft.Temps.dir("sketch-torn-plain")
    CurateStream.bootstrap(corpus, gatedRoot, withSketch = true)
    CurateStream.bootstrap(corpus, plainRoot)
    val live = new org.apache.hadoop.fs.Path(s"$gatedRoot/static/curate_sketch.bin")
    val full = {
      val in = fsOf(gatedRoot).open(live)
      val len = fsOf(gatedRoot).getFileStatus(live).getLen.toInt
      val b = new Array[Byte](len)
      try in.readFully(0L, b) finally in.close()
      b
    }
    plant(gatedRoot, "curate_sketch.bin", full.take(full.length / 2))
    for (root <- Seq(gatedRoot, plainRoot))
      CurateStream.ingestBatch(batchA, root).unpersist()
    assert(manifests(gatedRoot) === manifests(plainRoot))
  }

  test("interrupted swap recovery: a lone .tmp or .old is promoted") {
    val root = graft.Temps.dir("sketch-swap")
    CurateStream.bootstrap(corpus, root, withSketch = true)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(s"$root/static/curate_sketch.bin")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/static/.curate_sketch.tmp")
    val old = new org.apache.hadoop.fs.Path(s"$root/static/.curate_sketch.old")
    val items = KeySketch.read(spark, root).get.items
    // crash between tmp-write and park: .tmp holds the newest copy
    assert(fs.rename(dst, tmp))
    assert(KeySketch.read(spark, root).get.items === items)
    assert(fs.exists(dst) && !fs.exists(tmp))
    // crash between park and promote with the promote lost: .old rolls back
    assert(fs.rename(dst, old))
    assert(KeySketch.read(spark, root).get.items === items)
    assert(fs.exists(dst) && !fs.exists(old))
  }

  test("sharded gate: no false negatives through routing at S=1/4/16") {
    val s = spark
    import s.implicits._
    val keys = (0 until 200).map(i => s"key_$i").toDF("key")
    for (shards <- Seq(1, 4, 16)) {
      val sk = KeySketch.build(keys, "key", capacity = 0L, shards = shards)
      assert(sk.shardCount === shards)
      assert(sk.items === 200L)
      // every inserted key probes positive under the routed gate — the
      // exactness precondition (a false negative would silently skip
      // the confirm join and mis-keep a true duplicate); the gate
      // partitions rows across its shard branches, so superset =
      // count equality
      assert(sk.gate(keys, "key").count() === keys.count())
    }
  }

  test("sharded gate plans one filter image per branch, never the whole sketch") {
    val s = spark
    import s.implicits._
    val keys = (0 until 200).map(i => s"key_$i").toDF("key")
    val sk = KeySketch.build(keys, "key", capacity = 0L, shards = 16)
    val plan = sk.gate(keys, "key").queryExecution.analyzed
    // every Filter condition in the gate's plan references EXACTLY ONE
    // shard's serialized filter — the task closure of any branch
    // carries one image, so per-task executor memory is sketch/S (the
    // r9 advice: a single expression holding all S images made every
    // executor materialize the entire sketch, defeating the sharding)
    val perFilter = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case e: graft.functions.BloomMightContainExpr => e.bfBytes
        }
    }
    assert(perFilter.size === 16, "one branch per shard")
    assert(perFilter.forall(_.size === 1), "a branch must hold exactly one image")
    // and the branches hold 16 DISTINCT images (not one broadcast copy)
    assert(perFilter.flatten.distinct.size === 16)
  }

  test("a GSK2 monolithic image reads back as a 1-shard sketch (no gate loss on upgrade)") {
    val s = spark
    import s.implicits._
    val keys = (0 until 100).map(i => s"k2_$i").toDF("key")
    val root = graft.Temps.dir("sketch-gsk2")
    val built = KeySketch.build(keys, "key", capacity = 0L)
    // hand-write the pre-shard GSK2 layout: magic, capacity, items,
    // fpp, length-prefixed filter bytes, CRC32 trailer
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeInt(0x47534b32)
    d.writeLong(built.capacity)
    d.writeLong(built.items)
    d.writeDouble(built.fpp)
    val bfb = graft.functions.BloomExprs.serialize(built.shards.head.bf)
    d.writeInt(bfb.length)
    d.write(bfb)
    d.flush()
    val payload = bos.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val dir = new java.io.File(s"$root/static")
    dir.mkdirs()
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "curate_sketch.bin")))
    out.write(payload)
    out.writeLong(crc.getValue)
    out.close()
    // the upgraded reader must NOT treat it as corrupt: it reads as a
    // 1-shard sketch with the original counters and a working gate
    val read = KeySketch.read(spark, root)
    assert(read.isDefined, "GSK2 image was discarded as corrupt")
    assert(read.get.shardCount === 1)
    assert(read.get.items === built.items)
    assert(read.get.capacity === built.capacity)
    assert(read.get.gate(keys, "key").count() === keys.count())
    // and a write() round-trips it forward as GSK4
    KeySketch.write(spark, root, read.get)
    val rt = KeySketch.read(spark, root).get
    assert(rt.shardCount === 1 && rt.items === built.items)
  }

  test("sharded merge: per-shard item accounting, caller's sketch unmutated") {
    val s = spark
    import s.implicits._
    val base = (0 until 50).map(i => s"base_$i").toDF("key")
    val stored = KeySketch.build(base, "key", capacity = 0L, shards = 4)
    val batch = (0 until 20).map(i => s"fresh_$i").toDF("key")
    val merged = KeySketch.merge(stored, batch, "key")
    assert(merged.items === 70L)
    assert(stored.items === 50L) // copy-on-merge holds shard-wise
    assert(merged.shards.map(_.capacity) === stored.shards.map(_.capacity))
    assert(merged.gate(batch, "key").count() === batch.count())
    assert(merged.gate(base, "key").count() === base.count())
  }

  test("sharded ONLINE path: sharded = monolithic = ungated through ingest, crash replay, per-shard rebuild") {
    val s = spark
    import s.implicits._
    val ungatedRoot = graft.Temps.dir("sketch-online-ungated")
    val monoRoot = graft.Temps.dir("sketch-online-mono")
    val shardRoot = graft.Temps.dir("sketch-online-sharded")
    CurateStream.bootstrap(corpus, ungatedRoot)
    CurateStream.bootstrap(corpus, monoRoot, withSketch = true)
    CurateStream.bootstrap(corpus, shardRoot, withSketch = true,
      sketchShards = 4)
    assert(KeySketch.read(spark, shardRoot).get.shardCount === 4)
    for (root <- Seq(ungatedRoot, monoRoot, shardRoot))
      CurateStream.ingestBatch(batchA, root).unpersist()
    // crash window on the SHARDED root: batchB's sketch merge landed
    // but its keys upsert (and manifest) died — per-shard superset
    // must absorb the replay exactly like the monolith does
    val sk = KeySketch.read(spark, shardRoot).get
    KeySketch.write(spark, shardRoot, KeySketch.merge(sk,
      batchB.select(md5(col("text").cast("binary")).as("key")), "key"))
    for (root <- Seq(ungatedRoot, monoRoot, shardRoot))
      CurateStream.ingestBatch(batchB, root).unpersist()
    val expect = manifests(ungatedRoot)
    assert(manifests(monoRoot) === expect)
    assert(manifests(shardRoot) === expect)
    // per-shard saturation: shrink ONLY the shards that actually hold
    // items; maybeRebuild must rebuild those at 4x (floored at their
    // key count) and leave the healthy shards' geometry untouched
    val pre = KeySketch.read(spark, shardRoot).get
    val satIdx = pre.shards.zipWithIndex
      .collect { case (sh, i) if sh.items > 0 => i }.toSet
    assert(satIdx.nonEmpty)
    KeySketch.write(spark, shardRoot, KeySketch.Sketch(pre.fpp,
      pre.shards.zipWithIndex.map { case (sh, i) =>
        if (satIdx(i)) sh.copy(capacity = 0L) else sh
      }))
    val keyStore = Layout.readStatic(spark, shardRoot,
      CurateStream.KeysEntity).get
    assert(KeySketch.maybeRebuild(spark, shardRoot,
      keyStore.select("key"), "key"))
    val rebuilt = KeySketch.read(spark, shardRoot).get
    rebuilt.shards.zipWithIndex.foreach { case (sh, i) =>
      // saturated shards rebuild at max(4x capacity, 2x items) — here
      // capacity was forced to 0, so the 2x-items headroom floor wins
      if (satIdx(i))
        assert(sh.capacity === math.max(2 * pre.shards(i).items, 1L))
      else assert(sh.capacity === pre.shards(i).capacity)
    }
    // rebuilt shards carry exact counts and stay supersets of the store
    assert(rebuilt.items === keyStore.count())
    assert(rebuilt.gate(keyStore.select("key"), "key").count()
      === keyStore.count())
    assert(!KeySketch.maybeRebuild(spark, shardRoot,
      keyStore.select("key"), "key"))
    // post-rebuild ingest on all three roots classifies identically:
    // doc 7 re-sends kept doc 40's text (corpus dup), doc 45 is novel
    val batchC = docsDF(Seq(7L -> qtext(8), 45L -> qtext(9)))
    for (root <- Seq(ungatedRoot, monoRoot, shardRoot))
      CurateStream.ingestBatch(batchC, root).unpersist()
    val expect2 = manifests(ungatedRoot)
    assert(expect2(7L) === "dup_exact_corpus")
    assert(expect2(45L) === "kept")
    assert(manifests(monoRoot) === expect2)
    assert(manifests(shardRoot) === expect2)
  }
}
