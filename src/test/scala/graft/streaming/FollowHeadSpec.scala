package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.RpcStub

/** S6 live-follow semantics: catch-up to the head, then process blocks
  * that appear AFTER the stream started (the reference's websocket
  * subscription, stream.rs:339-372, restated as a head poll — the stub
  * head is advanced mid-stream to simulate new blocks arriving). */
class FollowHeadSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("followHead catches up, then indexes blocks arriving mid-stream, without duplicates") {
    val out = graft.Temps.dir("follow-live-out")
    val ckpt = graft.Temps.dir("follow-live-ckpt")
    val derive = Map("blocks" -> ((raw: DataFrame) =>
      raw.select(col("block_number"), col("ts"))))
    def maxIdx = Incremental.maxIndexedBlock(spark, out, "blocks")
    def waitUntil(target: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (maxIdx != Some(target) && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(maxIdx === Some(target))
    }
    try {
      val q = Incremental.followHead(
        spark, RpcStub.endpoint, out, ckpt, startBlock = 745L, derive, "blocks")
      try {
        waitUntil(RpcStub.Head) // catch-up leg: 745..750 in one batch
        RpcStub.setHead(RpcStub.Head + 3) // three "new blocks" arrive
        waitUntil(RpcStub.Head + 3) // live leg picks up 751..753
      } finally q.stop()
      val nums = spark.read.parquet(s"$out/dynamic/blocks")
        .select("block_number").collect().map(_.getLong(0)).sorted
      assert(nums.toSeq === (745L to RpcStub.Head + 3),
        "every block exactly once: replacement, not append")
    } finally RpcStub.setHead(RpcStub.Head)
  }

  test("live skeleton upsert: new skeletons appended once, replays skipped (stream.rs:172-253)") {
    val out = graft.Temps.dir("stream-skel-out")
    val ckpt = graft.Temps.dir("stream-skel-ckpt")
    val derive: Seq[(String, Incremental.Gap => DataFrame)] = Seq(
      "blocks" -> (g => g.blocks.select(col("block_number"), col("ts"))))
    val decompiler = graft.etl.Extract.standInDecompiler()
    def maxIdx = Incremental.maxIndexedBlock(spark, out, "blocks")
    def waitUntil(target: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (maxIdx != Some(target) && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(maxIdx === Some(target))
    }
    def skeletons = spark.read.parquet(s"$out/static/skeletons")
    def skeletonCount: Long =
      try skeletons.count()
      catch { case _: org.apache.spark.sql.AnalysisException => -1L } // not written yet
    // the upsert runs AFTER the tick's entity replacement — the blocks
    // table reaching the head doesn't imply the same tick's onGap has
    // committed yet, so poll the skeleton table itself
    def waitForSkeletons(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (skeletonCount != n && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(skeletonCount === n)
    }
    try {
      val q = Incremental.followHeadEntities(
        spark, RpcStub.endpoint, out, ckpt, startBlock = 745L, derive,
        onGap = g => Stream.upsertSkeletons(out,
          graft.etl.Decode.deployments(g.traces), decompiler))
      try {
        waitUntil(RpcStub.Head)
        // both golden skeletons seen in the catch-up gap, landed once
        // with the full column set
        waitForSkeletons(2)
        assert(skeletons.columns.toSet ===
          graft.domain.Schemas.skeleton.fields.map(_.name).toSet)
        // head advances: the new gap re-derives the same two skeletons —
        // the append-if-absent must skip them. Wait for the NEW gap's
        // upsert to have run (its blocks tick + one full extra tick).
        RpcStub.setHead(RpcStub.Head + 2)
        waitUntil(RpcStub.Head + 2)
        Thread.sleep(1500) // let the advancing tick's onGap commit
        assert(skeletonCount === 2, "replayed skeletons were re-appended")
      } finally q.stop()
    } finally RpcStub.setHead(RpcStub.Head)
  }
}
