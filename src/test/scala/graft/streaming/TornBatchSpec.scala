package graft.streaming

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sinks.Layout

/** The HALF-APPLIED batch contract, exercised directly. The object docs
  * argue it (probes exclude the batch's own ids; writes are anti-join
  * upserts; manifest lands last as the commit marker) and the stream
  * specs replay FULLY-applied batches; this spec constructs the torn
  * states themselves — a crash after each PREFIX of the write sequence
  * — and asserts the replayed ingest lands the exact final state of a
  * never-crashed run: same manifest statuses, same index row sets.
  *
  * Torn prefixes are built by hand-landing the same rows ingest would
  * (content keys / signatures / assigned cells for the would-be-kept
  * docs) BEFORE the first real ingest, simulating the crash window
  * between the index upserts and the manifest write. */
class TornBatchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val stop = Seq("the", "a", "of", "and", "to")

  private def qtext(k: Int): String =
    (0 until 45).flatMap(i =>
      if (i % 9 == 0) Seq(stop((i / 9) % 5), s"w${k}_$i") else Seq(s"w${k}_$i"))
      .mkString(" ")

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src' AS source",
        "CAST(length(text) AS INT) AS n_chars")
  }

  private def state(root: String): (Map[Long, String], Set[Long], Set[Long]) = {
    val s = spark
    import s.implicits._
    val man = Layout.readStatic(s, root, CurateStream.ManifestEntity).get
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    val keys = Layout.readStatic(s, root, CurateStream.KeysEntity).get
      .select("doc_id").as[Long].collect().toSet
    val bands = Layout.readStatic(s, root, CurateStream.BandsEntity).get
      .select("doc_id").as[Long].collect().toSet
    (man, keys, bands)
  }

  test("curate ingest replayed over every torn write prefix lands the clean state") {
    val s = spark
    import s.implicits._
    val corpus = docsDF(Seq(1L -> qtext(1), 29L -> qtext(6)))
    val batch = docsDF(Seq(
      10L -> qtext(1),   // dup_exact_corpus
      20L -> qtext(2),   // kept
      35L -> "just three tokens")) // low_quality

    // clean reference run
    val clean = graft.Temps.dir("torn-clean")
    CurateStream.bootstrap(corpus, clean)
    CurateStream.ingestBatch(batch, clean)
    val want = state(clean)

    // torn prefixes: crash after landing keys; after keys+bands; after
    // keys+bands+bench — in every case the manifest (commit marker) is
    // missing and the ingest must recompute identical statuses
    def keysRows(df: DataFrame) = df.selectExpr("md5(CAST(text AS BINARY)) AS key", "doc_id")
    val keptOnly = batch.where($"doc_id" === 20L)
    val prefixes: Seq[(String, String => Unit)] = Seq(
      "keys" -> { root =>
        Layout.upsertStatic(keysRows(keptOnly), root,
          CurateStream.KeysEntity, Seq("key", "doc_id"))
      },
      "keys+bands" -> { root =>
        Layout.upsertStatic(keysRows(keptOnly), root,
          CurateStream.KeysEntity, Seq("key", "doc_id"))
        val sig = keptOnly
          .withColumn("sig", graft.functions.EvmExprs.minHashSigFromText($"text"))
          .where($"sig".isNotNull)
          .select($"doc_id",
            org.apache.spark.sql.functions.element_at($"sig", 1).as("h0"),
            org.apache.spark.sql.functions.element_at($"sig", 2).as("h1"),
            org.apache.spark.sql.functions.element_at($"sig", 3).as("h2"),
            org.apache.spark.sql.functions.element_at($"sig", 4).as("h3"))
        Layout.upsertStatic(sig, root, CurateStream.BandsEntity, Seq("doc_id"))
      })
    prefixes.foreach { case (name, tear) =>
      val root = graft.Temps.dir(s"torn-$name")
      CurateStream.bootstrap(corpus, root)
      tear(root)
      CurateStream.ingestBatch(batch, root)
      assert(state(root) === want, s"torn prefix '$name' must replay clean")
    }
  }

  test("semantic ingest replayed over a torn cells prefix lands the clean state") {
    val s = spark
    import s.implicits._
    def vec(parts: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(6)(0.0); parts.foreach { case (i, x) => a(i) = x }; a.toSeq
    }
    val corpus = Seq(1L -> vec(0 -> 1.0), 2L -> vec(1 -> 1.0))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      10L -> vec(0 -> 1.0),            // dup_corpus rep 1
      20L -> vec(0 -> 0.25, 2 -> 1.0)) // kept
      .toDF("vec_id", "embedding")

    val clean = graft.Temps.dir("torn-sem-clean")
    SemanticStream.bootstrap(corpus, clean)
    SemanticStream.ingestVectors(batch, clean)
    def semState(root: String) = {
      val man = Layout.readStatic(s, root, SemanticStream.ManifestEntity).get
        .select("vec_id", "status").as[(Long, String)].collect().toMap
      val cells = Layout.readStatic(s, root, SemanticStream.CellsEntity).get
        .select("id").as[Long].collect().toSet
      (man, cells)
    }
    val want = semState(clean)

    // torn: the would-be-kept vector's cell row landed, manifest missing
    val torn = graft.Temps.dir("torn-sem")
    SemanticStream.bootstrap(corpus, torn)
    val cb = graft.ops.SimSearch.collectCodebook(
      Layout.readStatic(s, torn, SemanticStream.CodebookEntity).get)
    val ver = SemanticStream.codebookVersion(cb)
    val cellRow = graft.ops.SimSearch
      .ivfAssign(batch.where($"vec_id" === 20L), "vec_id", "embedding", cb, 1)
      .select($"id",
        org.apache.spark.sql.functions.element_at($"probes", 1)
          .getField("cid").as("cell"),
        $"v", $"n", org.apache.spark.sql.functions.lit(ver).as("ver"))
    Layout.upsertStatic(cellRow, torn, SemanticStream.CellsEntity, Seq("id"))
    SemanticStream.ingestVectors(batch, torn)
    assert(semState(torn) === want)
  }
}
