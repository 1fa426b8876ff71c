package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sinks.Layout

/** [[SemanticStream.run]] — the vector-side streaming driver — drives
  * SemanticStreamSpec's exact scenario through a real file-source
  * stream (one parquet file per micro-batch, arrival order forced) and
  * must land the identical manifest, plus the compactEvery sawtooth
  * floor on the two maintained stores. */
class SemanticRunSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def vec(parts: (Int, Double)*): Seq[Double] = {
    val a = Array.fill(6)(0.0)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("file-source vector stream lands the direct-call manifest; compaction floors files") {
    val s = spark
    import s.implicits._
    val corpus = df(Seq(1L -> vec(0 -> 1.0), 2L -> vec(1 -> 1.0)))
    val b1 = df(Seq(
      10L -> vec(0 -> 1.0),
      20L -> vec(0 -> 0.25, 2 -> 1.0),
      30L -> vec(0 -> 0.25, 2 -> 0.97),
      40L -> vec(1 -> 0.25, 3 -> 1.0)))
    val b2 = df(Seq(
      50L -> vec(0 -> 1.0),
      60L -> vec(0 -> 0.26, 2 -> 1.0),
      70L -> vec(1 -> 0.25, 4 -> 1.0)))

    val root = graft.Temps.dir("semantic-run-root")
    val rawDir = graft.Temps.dir("semantic-run-raw")
    val ckpt = graft.Temps.dir("semantic-run-ckpt")
    // SQ + slot sidecars armed: the stream's per-batch folds maintain
    // them and the compaction window must floor them too (r11 — a
    // long-running ingest otherwise accumulates one file per batch per
    // sidecar forever); 6-d vectors slice as 3 slots of width 2
    SemanticStream.bootstrap(corpus, root, withSq = true,
      withSlots = true, slotK = 4, slotSlices = 3, slotDim = 6)
    val q = SemanticStream.run(s, rawDir, b1.schema, root, ckpt,
      compactEvery = 1)
    b1.coalesce(1).write.mode("append").parquet(rawDir)
    q.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(rawDir)
    q.processAllAvailable()
    q.stop()

    val man = Layout.readStatic(s, root, SemanticStream.ManifestEntity).get
    val got = man.select("vec_id", "status", "rep_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // SemanticStreamSpec's expectations, verbatim
    assert(got === Map(
      10L -> ("dup_corpus", 1L), 20L -> ("kept", -1L),
      30L -> ("dup_batch", 20L), 40L -> ("kept", -1L),
      50L -> ("dup_corpus", 1L), 60L -> ("dup_corpus", 20L),
      70L -> ("kept", -1L)))

    val conf = s.sparkContext.hadoopConfiguration
    Seq(SemanticStream.CellsEntity, SemanticStream.ManifestEntity,
        SemanticStream.SqCodesEntity, SemanticStream.SlotCellsEntity)
      .foreach { e =>
        val p = new org.apache.hadoop.fs.Path(s"$root/static/$e")
        val it = p.getFileSystem(conf).listFiles(p, true)
        var n = 0
        while (it.hasNext)
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        assert(n === 1, s"$e should be compacted to one file, saw $n")
      }
    // and the compacted sidecars still hold exactly the kept set
    val keptIds = Set(1L, 2L, 20L, 40L, 70L)
    assert(Layout.readStatic(s, root, SemanticStream.SqCodesEntity).get
      .select("id").as[Long].collect().toSet === keptIds)
    assert(Layout.readStatic(s, root, SemanticStream.SlotCellsEntity).get
      .select("id").distinct().as[Long].collect().toSet === keptIds)
  }
}
