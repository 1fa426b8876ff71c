package graft.bench

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** The perceptual-hash BAND/RECALL law — q216's machinery measured
  * against brute force (the q163/LexPrune self-probe discipline: the
  * pigeonhole claim is a measured row, not a comment):
  *
  *   - corpus = the documents table plus deterministic variants at
  *     four mutation strengths (prefix overwrite of 1 / 8 / 32 / 64
  *     bytes), populating the Hamming spectrum from 0 to ~tens;
  *   - EXACT = all-pairs 64-bit Hamming over the dHash quarters
  *     (measurement baseline only — bounded corpus, never the
  *     production path);
  *   - BANDED = [[Multimodal.dHashNearDupPairs]] at radius t.
  *
  * Law: recall = 1.0 for t ≤ 3 (4 bands × 16 bits — any pair within
  * total distance 3 agrees on ≥ 1 whole quarter), decaying above as
  * the pigeonhole guarantee expires; candidate volume ≈ Σ bucket²
  * per band ≪ n²/2. JSON rows, family `phash_band`.
  *
  * Usage: `runMain graft.bench.PHashBench
  * [sfDir=/root/testdata/sf0.1]`. */
object PHashBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      // same collision cap as q216/q218: variant ids live at
      // doc_id + m·10⁶, so the base universe excludes that range
      val docs = graft.queries.Tables.documents(spark, sfDir)
        .where(col("doc_id") < 1000000L)
        .select(col("doc_id"), col("text"))
      val variants = Seq(1, 8, 32, 64).map { m =>
        docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + m * 1000000L).as("doc_id"),
            concat(lit("Z" * m), expr(s"substring(text, ${m + 1})"))
              .as("text"))
      }.reduce(_.unionByName(_))
      val media = Multimodal.asMedia(docs.unionByName(variants),
        "doc_id", "text")
      val n = media.count()
      val qs = Multimodal.dHashQuarters(media).localCheckpoint()
      // measurement baseline: all-pairs exact Hamming (bounded corpus)
      val hamming = (0 until 4).map(k =>
          bit_count(col(s"a_q$k").bitwiseXOR(col(s"b_q$k"))))
        .reduce(_ + _).cast("long")
      val exact = qs.toDF("a_id", "a_q0", "a_q1", "a_q2", "a_q3")
        .join(qs.toDF("b_id", "b_q0", "b_q1", "b_q2", "b_q3"),
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), hamming.as("h"))
        .localCheckpoint()
      // band-join candidate volume (radius-independent)
      val bands = (0 until 4).map(k =>
          qs.select(col("media_id"), lit(k).as("band"), col(s"q$k").as("key")))
        .reduce(_.unionByName(_))
      val cand = bands.toDF("a_id", "band", "key")
        .join(bands.toDF("b_id", "band", "key"), Seq("band", "key"))
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct().count()
      for (t <- Seq(0, 1, 3, 6, 10)) {
        val exactN = exact.where(col("h") <= t).count()
        val bandedN = Multimodal.dHashNearDupPairs(media, t).count()
        val recall =
          if (exactN == 0) 1.0 else bandedN.toDouble / exactN
        println(s"""{"family":"phash_band","n":$n,"t":$t,""" +
          s""""exact_pairs":$exactN,"banded_pairs":$bandedN,""" +
          s""""cand":$cand,"all_pairs":${n * (n - 1) / 2},""" +
          s""""recall":${math.round(recall * 10000) / 10000.0}}""")
      }
    } finally spark.stop()
  }
}
