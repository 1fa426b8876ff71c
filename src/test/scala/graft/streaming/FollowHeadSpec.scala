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
}
