package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import Tables._

/** Multimodal-column queries over `documents` treated as a media table
  * (payload = utf-8 bytes of `text`): the Spark-side plumbing of an
  * image/audio pipeline — opaque BINARY payloads, typed metadata,
  * codegen'd feature extraction, frame sampling. The codec itself is
  * stubbed (see [[graft.ops.Multimodal]]); the DuckDB oracles reproduce
  * the binary arithmetic over the same utf-8 payloads. */
object MediaOps {

  def defs: Map[String, Q] = Map(
    // binary feature extraction (size / checksum / head bytes)
    "q60_media_features" -> Q(
      (s, d) => Multimodal.binaryFeatures(
        Multimodal.asMedia(documents(s, d), "doc_id", "text")),
      Some("""SELECT doc_id AS media_id, 'image' AS kind,
             |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             |       md5(text) AS checksum,
             |       lower(hex(CAST(substring(text, 1, 8) AS BLOB))) AS head_hex
             |FROM documents""".stripMargin),
      "binary payload feature extraction: multimodal pillar"),

    // frame sampling (every 2nd 16-byte frame)
    "q61_frame_sample" -> Q(
      (s, d) => Multimodal.frameSample(
        Multimodal.asMedia(documents(s, d).where(col("doc_id") < 50), "doc_id", "text"),
        frameBytes = 16, stride = 2),
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id, CAST(text AS BLOB) AS payload,
             |         CAST(ceil(octet_length(CAST(text AS BLOB)) / 16.0) AS BIGINT) AS n_frames
             |  FROM documents WHERE doc_id < 50),
             |f AS (
             |  SELECT media_id, unnest(range(0, n_frames)) AS frame_idx, payload
             |  FROM m)
             |SELECT media_id, frame_idx,
             |       lower(substring(hex(payload), CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_hex
             |FROM f WHERE frame_idx % 2 = 0""".stripMargin),
      "fixed-size frame sampling via array expressions: multimodal pillar"),

    // per-partition (stubbed) codec decode. The mapPartitions stage is
    // the real plumbing under test; the stub's arithmetic (mean payload
    // byte) is deterministic, and the docs are pure ASCII, so the
    // oracle CAN recompute it — integer byte sums divided once, 6dp.
    "q62_media_decode" -> Q(
      (s, d) => Multimodal.decodePartition(
        Multimodal.asMedia(documents(s, d), "doc_id", "text")).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          round(col("mean_luma"), 6).as("mean_luma"), col("ok")),
      Some("""SELECT doc_id AS media_id, 'image' AS kind,
             | CAST(64 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
             | round(CASE WHEN length(text) = 0 THEN 0.0
             |   ELSE CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE) / length(text)
             |   END, 6) AS mean_luma,
             | length(text) > 0 AS ok
             |FROM documents""".stripMargin),
      "per-partition codec decode (stubbed, oracle-recomputed): multimodal pillar"),

    // resize stub — checksum plumbing oracle-checked
    "q63_media_resize" -> Q(
      (s, d) => Multimodal.resizeStub(
        Multimodal.asMedia(documents(s, d), "doc_id", "text"), factor = 4),
      Some("""SELECT doc_id AS media_id, md5(text) AS orig_checksum,
             |       md5(substring(text, 1,
             |         greatest(1, octet_length(CAST(text AS BLOB)) // 4))) AS resized_checksum,
             |       CAST(octet_length(CAST(text AS BLOB)) // 4 AS BIGINT) AS resized_bytes
             |FROM documents""".stripMargin),
      "resize plumbing (stubbed math): multimodal pillar"))
}
