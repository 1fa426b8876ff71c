package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Layout.compactStatic]] contract: many-batch append history
  * collapses to few files, the row multiset is untouched, re-compaction
  * is idempotent, and a missing entity is a None (not an error).
  * Crash safety needs no separate matrix here — compaction IS
  * [[Layout.replaceStatic]]'s atomic swap, whose kill-at-every-step
  * behavior LayoutSpec already pins. */
class CompactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("20-batch append history compacts to one file, rows identical") {
    val s = spark
    import s.implicits._
    val root = graft.Temps.dir("compact-root")
    // 20 incremental upserts — the CurateStream ingest shape; each
    // append lands at least one new file
    (0 until 20).foreach { b =>
      Layout.upsertStatic(
        (0 until 50).map(i => (b * 50L + i, s"v$b-$i")).toDF("k", "payload"),
        root, "idx", Seq("k"))
    }
    val before = Layout.readStatic(s, root, "idx").get
      .as[(Long, String)].collect().sorted.toSeq
    val Some((filesBefore, filesAfter)) =
      Layout.compactStatic(s, root, "idx")
    assert(filesBefore >= 20, s"append history should be fragmented, saw $filesBefore")
    assert(filesAfter === 1, "1000 tiny rows fit one 128MB-target file")
    val after = Layout.readStatic(s, root, "idx").get
      .as[(Long, String)].collect().sorted.toSeq
    assert(after === before, "compaction must not change the row multiset")

    // idempotent: a second pass rewrites 1 file to 1 file
    assert(Layout.compactStatic(s, root, "idx") === Some((1, 1)))
    // upserts keep working against the compacted table
    Layout.upsertStatic(Seq((-1L, "late")).toDF("k", "payload"),
      root, "idx", Seq("k"))
    assert(Layout.readStatic(s, root, "idx").get.count() === 1001L)
  }

  test("compacting a missing entity is None") {
    assert(Layout.compactStatic(spark,
      graft.Temps.dir("compact-empty"), "nope") === None)
  }
}
