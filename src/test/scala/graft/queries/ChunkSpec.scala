package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Tiling invariants of the stride-overlap chunker (q182): chunks
  * start on the stride grid, interior chunks are full-width, coverage
  * ends exactly at the document's last token, and consecutive chunks
  * overlap by W − S tokens — the properties a RAG index relies on so
  * no token is lost and no boundary is cut from both neighbors. */
class ChunkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val W = 64
  private val S = 48

  private lazy val chunks =
    Registry.all("q182_chunk_stride").fn(spark, "/root/testdata/sf0.001")
      .localCheckpoint()

  private lazy val docLens =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        size(graft.ops.TextAnalysis.tokens(col("text"))).cast("long")
          .as("len"))

  test("chunks sit on the stride grid with dense ordinals") {
    val offGrid = chunks.where(
      col("start_tok") =!= col("chunk_idx") * S + 1).count()
    assert(offGrid === 0)
    // ordinals are 0..nc-1 per doc: max+1 = count
    val gaps = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nc"), max(col("chunk_idx")).as("mx"))
      .where(col("mx") + 1 =!= col("nc")).count()
    assert(gaps === 0)
  }

  test("coverage ends at the last token and interior chunks are full-width") {
    val cover = chunks.groupBy(col("doc_id"))
      .agg(max(col("start_tok") + col("n_ctoks") - 1).as("covered"),
        max(col("chunk_idx")).as("last"))
    val bad = cover.join(docLens, Seq("doc_id"))
      .where(col("covered") =!= col("len")).count()
    assert(bad === 0)
    // every chunk except a doc's last is exactly W tokens
    val lastIdx = chunks.groupBy(col("doc_id"))
      .agg(max(col("chunk_idx")).as("last"))
    val shortInterior = chunks.join(lastIdx, Seq("doc_id"))
      .where(col("chunk_idx") < col("last") && col("n_ctoks") =!= W)
      .count()
    assert(shortInterior === 0)
  }

  test("consecutive full chunks overlap by exactly W - S tokens") {
    val a = chunks.select(col("doc_id"), col("chunk_idx"),
      col("start_tok"), col("n_ctoks"))
    val b = a.toDF("doc_id", "next_idx", "next_start", "next_n")
    val pairs = a.join(b,
      a("doc_id") === b("doc_id") && b("next_idx") === a("chunk_idx") + 1)
    val wrong = pairs.where(
      col("start_tok") + col("n_ctoks") - col("next_start") =!= (W - S))
      .count()
    assert(wrong === 0)
  }
}
