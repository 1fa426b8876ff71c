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

  /** Shared DuckDB CTE chain for the dHash near-dup queries (q216,
    * q218, q220, q221 replay the identical hash; one definition — r13
    * review). ASCII-ONLY REPLAY ASSUMPTION (r13 advice, documented):
    * the Spark side hashes the payload's UTF-8 BYTES while this
    * replay walks CHARACTERS (string_split + ascii + length), so the
    * two agree exactly when every character is single-byte — true of
    * the synthetic documents corpus, and the same discipline every
    * TextOps oracle already rides (tokenizers, shingles, span hashes
    * all replay character-wise). A non-ASCII corpus would shift
    * segment boundaries AND byte values, failing the gate loudly
    * (hash mismatch), not silently.
    * injected variant corpus → byte lists → gridRows·9 segment sums →
    * integer cross-multiplied mean comparisons → gridRows/2 ×16-bit
    * quarter packing → band join → candidate pairs → exact-Hamming
    * `pairs`. WIDTH-GENERIC since r14 (`gridRows`, the MediaExprs
    * knob): the default 8 replays q216/q218's exact chain; 16 replays
    * the wide layout q222 gates. Ends with the `pairs` CTE (a_id,
    * b_id, plus sa/sb quarters available via qq); callers append
    * their own tail. The base docs are capped to doc_id < 1000000 in
    * BOTH engines so the injected variant ids (doc_id + 10⁶) cannot
    * collide with real ids at any scale factor (vacuous at the
    * current 500-doc tables — hashes unchanged). */
  private def dHashPairsSql(maxHamming: Int, gridRows: Int = 8): String = {
    val nb = gridRows / 2
    val cells = gridRows * 9
    def qSql(k: Int): String =
      s"CAST(sum(CASE WHEN (ai//9)//2 = $k THEN " +
        s"bit * (CAST(1 AS BIGINT) << CAST(((ai//9)%2)*8 + ai%9 AS INT)) " +
        s"ELSE 0 END) AS BIGINT) AS q$k"
    val bandUnion = (0 until nb).map(k =>
      s"SELECT doc_id, $k AS band, q$k AS key FROM qq")
      .mkString("\n  UNION ALL ")
    val hammingSql = (0 until nb).map(k =>
      s"bit_count(xor(sa.q$k, sb.q$k))").mkString(" + ")
    s"""d0 AS (SELECT doc_id, text FROM documents
       |       WHERE doc_id < 1000000),
       |docs AS (SELECT doc_id, text FROM d0
       |         UNION ALL
       |         SELECT doc_id + 1000000, 'Z' || substring(text, 2)
       |         FROM d0 WHERE doc_id % 7 = 0),
       |b AS (SELECT doc_id,
       |        list_transform(string_split(text, ''), c -> ascii(c)) AS B,
       |        CAST(length(text) AS BIGINT) AS n FROM docs),
       |seg AS (SELECT doc_id, g.i, (g.i*n)//$cells AS lo,
       |          ((g.i+1)*n)//$cells AS hi, B
       |        FROM b CROSS JOIN (SELECT unnest(range(0, $cells)) AS i) g),
       |sv AS (SELECT doc_id, i,
       |         CAST(coalesce(list_sum(list_slice(B,
       |           CAST(lo+1 AS INT), CAST(hi AS INT))), 0) AS BIGINT) AS s,
       |         hi - lo AS l FROM seg),
       |cmp AS (SELECT a.doc_id, a.i AS ai,
       |          CASE WHEN a.s * b2.l < b2.s * a.l THEN 1 ELSE 0 END AS bit
       |        FROM sv a JOIN sv b2
       |          ON b2.doc_id = a.doc_id AND b2.i = a.i + 1
       |        WHERE a.i % 9 < 8),
       |qq AS (SELECT doc_id, ${(0 until nb).map(qSql).mkString(", ")}
       |       FROM cmp GROUP BY 1),
       |bands AS (
       |  $bandUnion),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key
       |           AND a.doc_id < b.doc_id),
       |pairs AS (SELECT a_id, b_id, CAST($hammingSql AS BIGINT) AS hamming
       |          FROM cand JOIN qq sa ON sa.doc_id = a_id
       |          JOIN qq sb ON sb.doc_id = b_id
       |          WHERE $hammingSql <= $maxHamming)""".stripMargin
  }

  /** The online-face corpus/batch split + keep-first resolution CTEs
    * (q220's dedup rule, shared verbatim by q223's index replay):
    * corp/bat partition the injected docs, `part` enumerates each
    * batch row's allowed partners (stored near-dups at ANY id —
    * first-arrival-wins — plus smaller-id batch-mates), `rt` carries
    * the least partner with its locality tag. Expects the `docs` and
    * `pairs` CTEs from [[dHashPairsSql]]. */
  private val onlineSplitSql: String =
    """corp AS (SELECT doc_id FROM docs
      |         WHERE doc_id < 1000000 AND doc_id % 3 <> 0),
      |bat AS (SELECT doc_id FROM docs
      |        WHERE doc_id >= 1000000 OR doc_id % 3 = 0),
      |sym AS (SELECT a_id AS x, b_id AS y FROM pairs
      |        UNION ALL SELECT b_id, a_id FROM pairs),
      |part AS (SELECT s.x AS media_id, s.y AS pid,
      |           CASE WHEN s.y IN (SELECT doc_id FROM corp)
      |                THEN 'corpus' ELSE 'batch' END AS tag
      |         FROM sym s
      |         WHERE s.x IN (SELECT doc_id FROM bat)
      |           AND (s.y IN (SELECT doc_id FROM corp) OR s.y < s.x)),
      |rep AS (SELECT media_id, min(pid) AS rep_id
      |        FROM part GROUP BY 1),
      |rt AS (SELECT p.media_id, p.pid, p.tag FROM part p
      |       JOIN rep ON rep.media_id = p.media_id
      |         AND rep.rep_id = p.pid)""".stripMargin

  /** The matching Spark-side injected corpus (capped base + one-byte
    * variants at doc_id + 10⁶ — both engines replay the injection). */
  private def injectedDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = documents(s, d).where(col("doc_id") < 1000000L)
      .select(col("doc_id"), col("text"))
    docs.unionByName(docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("Z"), expr("substring(text, 2)")).as("text")))
  }

  /** The online-face store build shared by q220/q223: bootstrap the
    * corpus split, ingest the batch split (both replay-idempotent, so
    * repeated invocations of either query land bit-stable state on
    * the memoized root). Returns (root, manifest). */
  private def onlineIngest(s: org.apache.spark.sql.SparkSession,
      d: String): (String, org.apache.spark.sql.DataFrame) = {
    import graft.streaming.MediaStream
    val root = graft.Temps.dirFor(s"phash-online-$d")
    val all = injectedDocs(s, d)
    val corpus = all.where(col("doc_id") < 1000000L &&
      col("doc_id") % 3 =!= 0)
    val batch = all.where(col("doc_id") >= 1000000L ||
      col("doc_id") % 3 === 0)
    MediaStream.bootstrap(
      Multimodal.asMedia(corpus, "doc_id", "text"), root)
    (root, MediaStream.ingestBatch(
      Multimodal.asMedia(batch, "doc_id", "text"), root, maxHamming = 3))
  }

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

    // PERCEPTUAL-HASH IMAGE NEAR-DUP DEDUP (r12 verdict #5): dHash
    // quarters over the payload bytes (native fused expression;
    // block-mean "grayscale" stands in for the stubbed codec — see
    // MediaExprs), banded 4×16-bit + exact Hamming re-rank — the q121
    // machinery on the media column, never all-pairs. The synthetic
    // corpus has no natural image near-dups, so the query INJECTS a
    // deterministic variant per (doc_id % 7 == 0) doc — first byte
    // overwritten, id offset by 10^6 — and both engines replay the
    // injection (the q126 precedent): a one-byte change moves one
    // grid-cell mean, so each (orig, variant) pair lands within
    // Hamming ≤ 2 and exercises the band join AND the re-rank with
    // guaranteed-nonempty results. The oracle replays segment sums →
    // integer cross-multiplied comparisons → quarter packing → band
    // join → bit_count re-rank, bit for bit.
    "q216_phash_near_dup" -> Q(
      (s, d) => Multimodal.dHashNearDupPairs(
        Multimodal.asMedia(injectedDocs(s, d), "doc_id", "text"),
        maxHamming = 3),
      Some(s"""WITH ${dHashPairsSql(3)}
              |SELECT a_id, b_id, hamming FROM pairs""".stripMargin),
      "perceptual-hash (dHash) image near-dup pairs: banded 16-bit quarters + exact Hamming re-rank over media payloads - multimodal dedup pillar"),

    // THE DEDUP DECISION over q216's pairs — q135's keep-first rule on
    // the media face: dup when a near-dup partner has a smaller id,
    // rep_id = the least such partner (kept representative), the
    // manifest a pipeline filters media by. Same injected corpus as
    // q216 so every variant resolves to its original.
    "q218_phash_dedup" -> Q(
      (s, d) => Multimodal.dHashDedupManifest(
        Multimodal.asMedia(injectedDocs(s, d), "doc_id", "text"),
        maxHamming = 3),
      Some(s"""WITH ${dHashPairsSql(3)},
              |reps AS (SELECT b_id AS media_id, min(a_id) AS rep_id
              |         FROM pairs GROUP BY 1)
              |SELECT docs.doc_id AS media_id,
              |  CASE WHEN rep_id IS NULL THEN 'kept' ELSE 'dup' END AS status,
              |  rep_id
              |FROM docs LEFT JOIN reps ON reps.media_id = docs.doc_id""".stripMargin),
      "keep-first dedup manifest over perceptual-hash near-dup pairs: dup/kept + representative provenance per media row"),

    // WIDE-GRID near-dup pairs — q216's pipeline at the 16×9 layout
    // (8 bands of ≤16 bits, pigeonhole-exact through radius 7): the
    // scale lever the `phash_band` family measures (double the
    // radius budget at the same 2¹⁶-value band keys), now
    // oracle-gated at width so the width-generic expression, banding,
    // and re-rank replay bit for bit in a second geometry — a
    // grid-constant regression would break exactly one of q216/q222.
    // maxHamming = 7 exercises the wide layout's full exact budget.
    "q222_phash_wide" -> Q(
      (s, d) => Multimodal.dHashNearDupPairs(
        Multimodal.asMedia(injectedDocs(s, d), "doc_id", "text"),
        maxHamming = 7, gridRows = 16),
      Some(s"""WITH ${dHashPairsSql(7, gridRows = 16)}
              |SELECT a_id, b_id, hamming FROM pairs""".stripMargin),
      "wide-grid (16x9, 8-band) perceptual-hash near-dup pairs: the measured width lever oracle-gated in a second geometry, pigeonhole-exact through radius 7"),

    // ONLINE media dedup (r13 verdict #2) — the maintained face of
    // q216/q218: the batch probes the STORED pHash band index
    // (graft.streaming.MediaStream — the curate_bands discipline on
    // the media column) instead of re-hashing the corpus per run.
    // Two phases, both replayed: bootstrap seeds the quarters index
    // from the corpus split (base docs with doc_id % 3 != 0); the
    // ingest batch (base docs with doc_id % 3 == 0 plus ALL injected
    // variants) probes it. The split is chosen so every status
    // arises: a variant of a corpus doc → dup_corpus (rep = the
    // stored original), a variant of a batch doc (doc_id % 21 == 0)
    // → dup_batch (rep = the smaller batch-mate), plain batch docs →
    // kept. The oracle computes the same pairs via the shared CTE
    // chain over ALL docs, then applies the rule: partners of a batch
    // row are stored near-dups (ANY id — first-arrival-wins across
    // batches) plus smaller-id batch-mates; rep = least partner,
    // status by the rep's locality.
    "q220_phash_online" -> Q(
      (s, d) => onlineIngest(s, d)._2,
      Some(s"""WITH ${dHashPairsSql(3)},
              |$onlineSplitSql
              |SELECT b.doc_id AS media_id,
              |       CASE WHEN rt.pid IS NULL THEN 'kept'
              |            WHEN rt.tag = 'corpus' THEN 'dup_corpus'
              |            ELSE 'dup_batch' END AS status,
              |       rt.pid AS rep_id
              |FROM bat b LEFT JOIN rt ON rt.media_id = b.doc_id""".stripMargin),
      "online media dedup: the batch probes the MAINTAINED pHash band index (corpus never re-hashed) - per-batch manifest with dup_corpus/dup_batch/kept provenance, the curate-stream discipline on the media column"),

    // BAND-INDEX HEALTH of the maintained media store — cellImbalance's
    // analog for the banded-join face: per band, the key-bucket stats
    // that PRICE every future batch's probe (est_cand = Σ_key C(n,2)
    // is literally the per-band corpus-side candidate bill; top_share
    // the single-bucket concentration a degenerating payload
    // distribution inflates — e.g. byte-starved payloads hashing
    // toward zero keys). Runs over the SAME maintained store q220
    // lands; the oracle replays the index content (corpus ∪ kept
    // batch rows via the shared keep-first CTEs) and its band
    // statistics. One aggregate over derived band rows; the corpus is
    // never re-hashed on the Spark side — the index is read.
    "q223_media_band_skew" -> Q(
      (s, d) => {
        val (root, man) = onlineIngest(s, d)
        man.unpersist()
        graft.streaming.MediaStream.bandSkew(s, root)
      },
      Some(s"""WITH ${dHashPairsSql(3)},
              |$onlineSplitSql,
              |keptb AS (SELECT b.doc_id FROM bat b
              |          LEFT JOIN rt ON rt.media_id = b.doc_id
              |          WHERE rt.pid IS NULL),
              |idx AS (SELECT doc_id FROM corp
              |        UNION ALL SELECT doc_id FROM keptb),
              |ib AS (SELECT bands.band, bands.key FROM bands
              |       JOIN idx USING (doc_id)),
              |g AS (SELECT band, key, CAST(count(*) AS BIGINT) AS n
              |      FROM ib GROUP BY 1, 2)
              |SELECT band, CAST(sum(n) AS BIGINT) AS n_rows,
              |       CAST(count(*) AS BIGINT) AS n_keys,
              |       round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_share,
              |       CAST(sum((n*(n-1))//2) AS BIGINT) AS est_cand
              |FROM g GROUP BY 1""".stripMargin),
      "band-index health of the maintained media store: per-band key-bucket stats (top-bucket share + the Sum C(n,2) candidate bill) - the cellImbalance analog an operator trends to catch probe-cost degradation before it bites"),

    // CANONICAL ROOTS over the pHash near-dup graph (r13 verdict #5) —
    // q101's last-mile shape on the media face: q218's rep_id is
    // PROVENANCE (non-transitive — a rep may itself be a dup of a
    // still-smaller id), while a pipeline FILTERING media wants every
    // row mapped to the one kept canonical per cluster. Pairs → the
    // pointer-jumping connected components (GraphOps, the q71/q101
    // machinery) → per-cluster min-id root + cluster size + keep
    // flag. One bounded composition over the banded pair set, never
    // all-pairs; the oracle replays the closure with a recursive CTE
    // over the shared dHash chain (the q101/q209 pattern).
    "q221_phash_roots" -> Q(
      (s, d) => {
        val media = Multimodal.asMedia(injectedDocs(s, d), "doc_id", "text")
        val pairs = Multimodal.dHashNearDupPairs(media, maxHamming = 3)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val comp = graft.analytics.GraphOps.connectedComponents(pairs)
          .toDF("media_id", "root_id")
        val assigned = media.select(col("media_id"))
          .join(comp, Seq("media_id"), "left")
          .select(col("media_id"),
            coalesce(col("root_id"), col("media_id")).as("root_id"))
        val sizes = assigned.groupBy(col("root_id"))
          .agg(count(lit(1)).as("cluster_size"))
        assigned.join(sizes, Seq("root_id"))
          .select(col("media_id"), col("root_id"), col("cluster_size"),
            (col("media_id") === col("root_id")).as("keep"))
      },
      Some(s"""WITH RECURSIVE ${dHashPairsSql(3)},
              |sym AS (SELECT a_id AS src, b_id AS dst FROM pairs
              |        UNION SELECT b_id, a_id FROM pairs),
              |reach(id, r) AS (
              |  SELECT src, src FROM sym
              |  UNION
              |  SELECT sym.dst, reach.r FROM reach JOIN sym ON sym.src = reach.id),
              |comp AS (SELECT id AS media_id, min(r) AS root_id
              |         FROM reach GROUP BY 1),
              |assigned AS (
              |  SELECT docs.doc_id AS media_id,
              |         coalesce(comp.root_id, docs.doc_id) AS root_id
              |  FROM docs LEFT JOIN comp ON comp.media_id = docs.doc_id),
              |sz AS (SELECT root_id, count(*) AS cluster_size
              |       FROM assigned GROUP BY 1)
              |SELECT a.media_id, a.root_id,
              |       CAST(sz.cluster_size AS BIGINT) AS cluster_size,
              |       a.media_id = a.root_id AS keep
              |FROM assigned a JOIN sz USING (root_id)""".stripMargin),
      "canonical roots over the pHash near-dup graph: banded pairs -> connected components -> per-cluster min-id root, the kept-canonical mapping a media-filtering pipeline consumes (q218's rep_id is provenance, this is the transitive closure)"),

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
