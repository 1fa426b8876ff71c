package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, timestamp_micros, unix_micros}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the events-reader contract against testdata drift: the driver
  * has shipped `events.ts` as parquet TIMESTAMP(NANOS) (arriving as a
  * raw Long under the pinned nanosAsLong conf) and as TIMESTAMP(MICROS)
  * (arriving as TIMESTAMP_NTZ). [[Tables.events]] must yield identical
  * epoch-micros under every encoding, and fail loudly — not silently
  * misread — on one it doesn't know.
  *
  * The nanos era is exercised by writing a raw INT64 `ts`: under
  * nanosAsLong a TIMESTAMP(NANOS) column and a plain INT64 column are
  * indistinguishable to the scanned schema (both LongType), which is
  * precisely the branch point the reader keys on. Spark cannot write
  * TIMESTAMP(NANOS) itself, so this is also the only faithful way to
  * produce that arrival shape from inside a spec. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Epoch micros well inside the testdata's range; × 1000 stays in Long.
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1700009999999999L)

  private def freshDir(): String =
    Files.createTempDirectory("tables-spec").toString

  private def writeEvents(dir: String)(ts: org.apache.spark.sql.Column): Unit =
    micros.toDF("us")
      .select(
        col("us").as("event_id"), ts.as("ts"), col("us").as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def readBack(dir: String): Seq[Long] =
    Tables.events(spark, dir)
      .select(unix_micros(col("ts").cast("timestamp")))
      .as[Long].collect().toSeq.sorted

  test("nanos-as-long era and micros era decode to identical epoch-micros") {
    val nanosDir = freshDir()
    writeEvents(nanosDir)(col("us") * 1000L) // raw INT64 nanos → LongType branch
    val microsDir = freshDir()
    writeEvents(microsDir)(timestamp_micros(col("us"))) // TIMESTAMP_MICROS → cast branch

    assert(Tables.events(spark, nanosDir).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(readBack(nanosDir) === micros.sorted)
    assert(readBack(microsDir) === micros.sorted)
  }

  test("TIMESTAMP_NTZ encoding decodes identically (UTC session)") {
    val dir = freshDir()
    writeEvents(dir)(timestamp_micros(col("us")).cast("timestamp_ntz"))
    assert(readBack(dir) === micros.sorted)
  }

  test("an unknown ts encoding fails loudly at read, not silently downstream") {
    val dir = freshDir()
    writeEvents(dir)((col("us") / 1e6).cast("double"))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }
}
