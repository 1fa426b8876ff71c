package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.Layout
import graft.streaming.CurateStream

/** Dress-rehearsal for [[CurateStream]]'s maintained indexes under a
  * long ingest — closes the loop on the round-6 open item: the
  * `curate_keys`/`curate_bands`/`curate_bench`/`curate_manifest`
  * stores grow forever via per-batch [[Layout.upsertStatic]] appends,
  * and every batch's probes pay the store's FILE LAYOUT (listing +
  * footer reads + one scan task per append-sized file), not just its
  * row count. ExtractRehearsal measured the analogous law for the
  * merged extract dimensions; this measures the curate-index face and
  * its remedy, [[Layout.compactStatic]].
  *
  * Two variants over the same deterministic batch stream:
  *   - `none`     — never compact (the disease: files grow ~4/batch,
  *     per-batch probe cost grows with the append history);
  *   - `everyC`   — compact all four entities every C batches (the
  *     remedy: file count sawtooths back to ~1 per entity, per-batch
  *     cost stays at the data's size; the compaction pass itself is
  *     timed and reported separately — it rewrites the INDEX tables,
  *     whose rows are a small projection of the corpus, never the
  *     corpus).
  *
  * Batch stream (deterministic): batch b takes the docs with
  * `doc_id % batches == b`, re-ids them to a disjoint range, keeps
  * every 5th text VERBATIM (exercising the dup_exact_corpus probe) and
  * suffixes every token of the rest with a (batch, doc)-key (fresh
  * docs — same distinct-row discipline as [[ScaleLaws.amplifyDocs]]).
  *
  * Usage: `runMain graft.bench.CurateRehearsal [batches=50]
  * [compactEvery=10] [sfDir=/root/testdata/sf0.1]` — runs BOTH
  * variants, prints one `curate_ingest` JSON line per (variant, batch)
  * plus a `curate_compact` line per compaction pass, then a markdown
  * summary for SCALE.md. */
object CurateRehearsal {

  private val Entities = Seq(CurateStream.KeysEntity, CurateStream.BandsEntity,
    CurateStream.BenchEntity, CurateStream.SpansEntity,
    CurateStream.PostingsEntity, CurateStream.DlEntity,
    CurateStream.ManifestEntity)

  private def parquetFiles(spark: SparkSession, root: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    Entities.map { e =>
      val p = new org.apache.hadoop.fs.Path(s"$root/static/$e")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext)
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        n
      }
    }.sum
  }

  /** Batch b of the deterministic stream (see object doc). Stopwords
    * survive the mutation unsuffixed: a fully-suffixed doc has
    * stopword_ratio 0 and dies at the low_quality gate (the exact
    * property ScaleLaws exploits to make amplified copies inert) — but
    * THIS harness needs its fresh docs KEPT, or the maintained index
    * never grows and the growth law under test goes unmeasured. */
  def batchOf(base: DataFrame, b: Int, batches: Int): DataFrame = {
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    val mutated = concat_ws(" ", transform(toks, t =>
      when(t.isin("the", "a", "of", "and", "to"), t)
        .otherwise(concat(t, lit(s"_b${b}x"), col("doc_id")))))
    base.where(pmod(col("doc_id"), lit(batches)) === b)
      .select(
        (lit(10000000L) + col("doc_id") * 1000L + b).as("doc_id"),
        when(col("doc_id") % 5 === 0, col("text")).otherwise(mutated).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(50)
    val compactEvery = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      val base = graft.queries.Tables.documents(spark, sfDir).localCheckpoint()
      // span variants measure the q147 layer's marginal cost: the span
      // store is the one index linear in corpus TOKENS, so its probe +
      // fold dominate the delta vs the doc-level variants
      // the sketch variant measures the gated exact layer's marginal
      // effect: at this corpus/batch ratio the confirm join is small
      // either way, so the expected result is parity on wall-clock with
      // candidate-volume accounting living in the bloom_gate_q149
      // ScaleLaws family — the rehearsal's job is to prove the gate
      // rides the long-ingest maintenance loop (merge + saturation
      // rebuild at compaction windows) without perturbing the law
      // sketch variants by shard count: 0 = ungated, 1 = monolith,
      // 4 = the sharded online gate (per-shard merge + rebuild)
      // the lex variant measures the q175 inverted-index upkeep: two
      // more anti-join upserts per batch (postings = one tokenize +
      // groupBy over KEPT batch texts; dl = a projection of the landed
      // frame), riding the same parallel fan-out — so the expected
      // marginal cost is near zero unless the postings upsert becomes
      // the slowest member of the fan-out
      // the cert variant measures the q203 certificate upkeep: one
      // ~8-row agg + upsert per batch riding the parallel fan-out —
      // expected ≈ lex parity (never the slowest fan-out member)
      val variants = Seq(
        ("none", 0, false, 0, false, false),
        (s"every$compactEvery", compactEvery, false, 0, false, false),
        ("spans-none", 0, true, 0, false, false),
        (s"spans-every$compactEvery", compactEvery, true, 0, false, false),
        (s"sketch-every$compactEvery", compactEvery, false, 1, false, false),
        (s"sketch4-every$compactEvery", compactEvery, false, 4, false, false),
        (s"lex-every$compactEvery", compactEvery, false, 0, true, false),
        (s"cert-every$compactEvery", compactEvery, false, 0, false, true))
        // optional 4th arg: comma-separated variant-name filter for
        // focused re-measurement (a full 7×50 matrix is ~30 min)
        .filter { v =>
          args.lift(3).forall(_.split(',').map(_.trim).contains(v._1))
        }
      val rows = variants.flatMap { case (variant, every, spans, sketch, lex, cert) =>
        val root = graft.Temps.dir(s"curate-rehearsal-$variant")
        CurateStream.bootstrap(base, root, withSpans = spans,
          withSketch = sketch > 0, sketchShards = math.max(sketch, 1),
          withLex = lex, withCert = cert)
        (0 until batches).map { b =>
          val batch = batchOf(base, b, batches).localCheckpoint()
          val t0 = System.nanoTime()
          val manifest = CurateStream.ingestBatch(batch, root,
            spanGate = spans, lexIndex = lex, certIndex = cert)
          val nMan = manifest.count() // manifest is localCheckpointed: free
          val secs = (System.nanoTime() - t0) / 1e9
          // the harness is a long-lived session too: drop the per-batch
          // pinned frames (same discipline ingestBatch applies to its
          // own intermediates)
          batch.unpersist(); manifest.unpersist()
          val files = parquetFiles(spark, root)
          val keysRows = Layout.readStatic(spark, root, CurateStream.KeysEntity)
            .map(_.count()).getOrElse(0L)
          var compactSecs = 0.0
          if (every > 0 && (b + 1) % every == 0) {
            val c0 = System.nanoTime()
            Entities.foreach(Layout.compactStatic(spark, root, _))
            if (sketch > 0)
              Layout.readStatic(spark, root, CurateStream.KeysEntity)
                .foreach { keys =>
                  graft.streaming.KeySketch.maybeRebuild(
                    spark, root, keys.select("key"), "key")
                }
            compactSecs = (System.nanoTime() - c0) / 1e9
            println(s"""{"family":"curate_compact","variant":"$variant","batch":$b,""" +
              s""""files_before":$files,"files_after":${parquetFiles(spark, root)},""" +
              s""""secs":${math.round(compactSecs * 100) / 100.0}}""")
          }
          println(s"""{"family":"curate_ingest","variant":"$variant","batch":$b,""" +
            s""""batch_docs":$nMan,"index_keys":$keysRows,"files":$files,""" +
            s""""secs":${math.round(secs * 100) / 100.0}}""")
          (variant, b, nMan, keysRows, files, secs, compactSecs)
        }
      }
      println("\n| variant | batch | index keys | files | ingest secs | compact secs |")
      println("|---|---|---|---|---|---|")
      rows.foreach { case (v, b, _, k, f, s, cs) =>
        println(f"| $v | $b%d | $k%d | $f%d | $s%.2f | $cs%.2f |")
      }
      // the law in two numbers per variant: mean ingest secs over the
      // first and last fifth of the stream
      val fifth = math.max(batches / 5, 1)
      variants.foreach { case (v, _, _, _, _, _) =>
        val vs = rows.filter(_._1 == v)
        val head = vs.take(fifth).map(_._6).sum / fifth
        val tail = vs.takeRight(fifth).map(_._6).sum / fifth
        println(f"$v: mean ingest secs first-$fifth=$head%.2f last-$fifth=$tail%.2f " +
          f"(x${tail / head}%.2f), files at end=${vs.last._5}")
      }
    } finally spark.stop()
  }
}
