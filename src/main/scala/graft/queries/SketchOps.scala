package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.BloomGate
import Tables._

/** Sketch-probe queries — gates whose sketches compress an INDEX, not
  * an answer: the output is exact (and therefore plain-SQL oracle-
  * checkable) while the sketch only prunes work. */
object SketchOps {

  def defs: Map[String, Q] = Map(
    // Bloom-gated exact corpus dedup: batch keys probe a Bloom sketch
    // of the corpus key set; only might-contain candidates pay the
    // confirm semi-join. No false negatives → the flags equal the
    // ungated semi-join bit for bit, which is exactly what the oracle
    // states (the sketch never appears in it — it provably cannot
    // change the answer, only the plan). BloomGateSpec pins the
    // pruning itself (candidate count ≈ dups + fpp·novel) and the
    // gate/ungated equality across fpp settings.
    "q149_bloom_gate" -> Q(
      (s, d) => {
        val k = documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("key"))
        val corpus = k.where(col("doc_id") % 5 =!= 0).select(col("key"))
          .localCheckpoint() // sketch build + confirm join both read it
        val batch = k.where(col("doc_id") % 5 === 0)
        BloomGate.corpusDupFlag(batch, corpus, "key",
            expectedItems = 4096L, fpp = 0.01)
          .select(col("doc_id"), col("key"), col("is_dup_corpus"))
      },
      Some("""WITH k AS (SELECT doc_id, md5(text) AS key FROM documents),
             |c AS (SELECT key FROM k WHERE doc_id % 5 <> 0)
             |SELECT doc_id, key,
             |       (key IN (SELECT key FROM c)) AS is_dup_corpus
             |FROM k WHERE doc_id % 5 = 0""".stripMargin),
      "Bloom-gated exact dedup: join-free probe settles novel keys, confirm join only behind sketch positives"),

    // the gate's 10^10-key deployment shape: the SAME semantics as
    // q149 through an 8-shard sketch — shards built grouped in one
    // shuffle (no monolithic filter, no driver-side bitset merge),
    // probes routed per row by the build's own xxhash64-mod. The
    // oracle is the identical plain semi-join: sharding re-shapes
    // where the bits live, never the answer (BloomGateSpec pins
    // sharded ≡ monolithic ≡ ungated across shard counts).
    "q166_sharded_bloom_gate" -> Q(
      (s, d) => {
        val k = documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("key"))
        val corpus = k.where(col("doc_id") % 5 =!= 0).select(col("key"))
          .localCheckpoint() // shard build + confirm join both read it
        val batch = k.where(col("doc_id") % 5 === 0)
        BloomGate.shardedCorpusDupFlag(batch, corpus, "key",
            shards = 8, expectedItems = 4096L, fpp = 0.01)
          .select(col("doc_id"), col("key"), col("is_dup_corpus"))
      },
      Some("""WITH k AS (SELECT doc_id, md5(text) AS key FROM documents),
             |c AS (SELECT key FROM k WHERE doc_id % 5 <> 0)
             |SELECT doc_id, key,
             |       (key IN (SELECT key FROM c)) AS is_dup_corpus
             |FROM k WHERE doc_id % 5 = 0""".stripMargin),
      "sharded Bloom gate: grouped shard build + per-row shard routing, output = the plain semi-join"),

    // CMS-gated exact heavy hitters: shingles appearing in ≥ 3 docs,
    // exact counts — the count-min estimate (never an underestimate)
    // admits a superset of the true heavies per row, and only admitted
    // rows enter the exact count shuffle, whose map-side combine then
    // collapses to the admitted vocabulary instead of the full one.
    // The oracle states the plain GROUP BY ... HAVING — like q149's
    // sketch, the CMS provably cannot change the answer, only the
    // plan (HeavyHittersSpec pins gate/ungated equality and the
    // admitted-row sliver).
    "q156_cms_hot_shingles" -> Q(
      (s, d) => {
        val sh = documents(s, d)
          .select(explode(graft.functions.EvmExprs
            .shingleHashesFromText(col("text"))).as("sh"))
        graft.ops.HeavyHitters.atLeast(sh, "sh", threshold = 3L)
      },
      Some {
        import TextOps.{toksSql, shinglesSql, tokHashSql}
        s"""WITH t AS (SELECT doc_id, $toksSql AS T FROM documents),
           |s AS (SELECT doc_id,
           |        unnest(list_distinct(list_transform(${shinglesSql("T")},
           |          x -> ${tokHashSql("x")}))) AS sh
           |      FROM t)
           |SELECT sh, CAST(count(*) AS BIGINT) AS cnt
           |FROM s GROUP BY 1 HAVING count(*) >= 3""".stripMargin
      },
      "CMS-gated exact heavy hitters: only sketch-admitted rows enter the count shuffle, output = plain GROUP BY/HAVING"))
}
