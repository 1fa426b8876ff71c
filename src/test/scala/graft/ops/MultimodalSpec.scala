package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def media() = {
    import spark.implicits._
    Multimodal.asMedia(
      Seq((1L, "abcd"), (2L, ""), (3L, "0123456789abcdef0123")).toDF("doc_id", "text"),
      "doc_id", "text")
  }

  test("asMedia builds payload + typed metadata") {
    val m = media().collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(new String(m(1L).getAs[Array[Byte]]("payload"), "UTF-8") === "abcd")
    assert(m(1L).getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") === 4L)
  }

  test("binaryFeatures: size/checksum/head are byte-exact") {
    val f = Multimodal.binaryFeatures(media()).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(f(1L).getAs[Long]("n_bytes") === 4L)
    assert(f(1L).getAs[String]("checksum") === "e2fc714c4727ee9395f324cd2e7f331f") // md5("abcd")
    assert(f(1L).getAs[String]("head_hex") === "61626364")
    assert(f(2L).getAs[Long]("n_bytes") === 0L)
  }

  test("frameSample keeps every stride-th frame incl. short tail") {
    val fs = Multimodal.frameSample(media(), frameBytes = 8, stride = 2).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx")) -> r.getAs[String]("frame_hex"))
      .toMap
    // doc 3: 20 bytes → frames 0,1,2; stride 2 keeps 0 and 2 (tail of 4 bytes)
    assert(fs((3L, 0L)) === "3031323334353637")
    assert(fs((3L, 2L)) === "30313233") // short tail
    assert(!fs.contains((3L, 1L)))
  }

  test("decodePartition: stub decode is deterministic and batch-shaped") {
    val d = Multimodal.decodePartition(media()).collect()
      .map(x => x.media_id -> x).toMap
    assert(d(1L).ok && d(1L).width === 64)
    // mean byte of "abcd" = (97+98+99+100)/4 = 98.5
    assert(math.abs(d(1L).mean_luma - 98.5) < 1e-12)
    assert(!d(2L).ok && d(2L).mean_luma === 0.0)
  }

  test("resizeStub: truncating byte arithmetic") {
    val r = Multimodal.resizeStub(media(), factor = 4).collect()
      .map(x => x.getAs[Long]("media_id") -> x).toMap
    assert(r(3L).getAs[Long]("resized_bytes") === 5L) // 20/4
    assert(r(1L).getAs[Long]("resized_bytes") === 1L) // 4/4
  }

  test("readBinaryFiles: binaryFile source with glob filter -> media schema") {
    val dir = java.nio.file.Paths.get(graft.Temps.dir("graft-media"))
    java.nio.file.Files.write(dir.resolve("7.img"), "payload7".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("12.img"), Array[Byte](0, 1, 2, 3))
    java.nio.file.Files.write(dir.resolve("ignore.txt"), "nope".getBytes("UTF-8"))
    val m = Multimodal.readBinaryFiles(spark, dir.toString, "*.img", "image")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(m.keySet === Set(7L, 12L)) // .txt filtered at the source
    assert(new String(m(7L).getAs[Array[Byte]]("payload"), "UTF-8") === "payload7")
    val meta = m(12L).getStruct(m(12L).fieldIndex("meta"))
    assert(meta.getAs[String]("kind") === "image")
    assert(meta.getAs[Long]("n_bytes") === 4L)
    // composes with the downstream feature stage unchanged
    val feats = Multimodal.binaryFeatures(
      Multimodal.readBinaryFiles(spark, dir.toString, "*.img", "image"))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(feats === Map(7L -> 8L, 12L -> 4L))
  }
}
