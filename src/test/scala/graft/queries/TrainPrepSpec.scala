package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Properties of the round-10 training-prep operators: BPE merge
  * learning (q186), the multi-epoch reshuffle (q185), and the
  * leakage-safe eval split (q187). Each pins the part of the semantics
  * the DuckDB hash-compare alone can't distinguish from a plausible
  * wrong implementation. */
class TrainPrepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  // ---- q186: merge application semantics ----

  private def applied(word: String, a: String, b: String): Seq[String] = {
    import spark.implicits._
    Seq(word.split(" ").toSeq).toDF("syms")
      .select(TextOps.bpeApplyMerge(col("syms"), a, b).as("m"))
      .collect()(0).getSeq[String](0)
  }

  test("bpe merge folds runs left-to-right non-overlapping") {
    // the separator-replace bug would merge "a a a a" once, not twice
    assert(applied("a a a a", "a", "a") === Seq("aa", "aa"))
    assert(applied("a a a", "a", "a") === Seq("aa", "a"))
    assert(applied("b a b", "a", "b") === Seq("b", "ab"))
    assert(applied("a b a b", "a", "b") === Seq("ab", "ab"))
    // the merged symbol does not re-trigger the same rule
    assert(applied("a a b b", "a", "b") === Seq("a", "ab", "b"))
    // no occurrence → identity
    assert(applied("x y z", "a", "b") === Seq("x", "y", "z"))
  }

  test("bpe learned merges have non-increasing counts and composable symbols") {
    val rows = Registry.all("q186_bpe_merges").fn(spark, sfDir)
      .orderBy(col("merge_rank")).collect()
    assert(rows.length === 4)
    val counts = rows.map(_.getLong(3))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y },
      s"pair counts must be non-increasing: ${counts.toSeq}")
    // every learned symbol is either a single char or a previously
    // produced merge — the defining closure property of a BPE vocab
    val known = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      val (a, b) = (r.getString(1), r.getString(2))
      assert(a.length == 1 || known.contains(a), s"unknown left symbol $a")
      assert(b.length == 1 || known.contains(b), s"unknown right symbol $b")
      known += a + b
    }
  }

  test("bpe encode trajectory drops by exactly each merge's pair count") {
    val merges = Registry.all("q186_bpe_merges").fn(spark, sfDir)
      .orderBy(col("merge_rank")).collect()
    val traj = Registry.all("q189_bpe_encode").fn(spark, sfDir)
      .orderBy(col("merge_rank")).collect()
    assert(traj.length === 5)
    // each greedy merge removes one symbol per applied occurrence.
    // For a ≠ b occurrences cannot overlap (the next start would need
    // a = b), so applied == counted exactly; for a == b runs overlap
    // and applied < counted is legal.
    (0 until 4).foreach { r =>
      val drop = traj(r).getLong(1) - traj(r + 1).getLong(1)
      val (a, b) = (merges(r).getString(1), merges(r).getString(2))
      if (a != b)
        assert(drop === merges(r).getLong(3),
          s"round ${r + 1}: total_syms dropped $drop, " +
            s"pair_count was ${merges(r).getLong(3)}")
      else
        assert(drop > 0 && drop <= merges(r).getLong(3),
          s"round ${r + 1}: drop $drop outside (0, pair_count]")
      val vGrow = traj(r + 1).getLong(2) - traj(r).getLong(2)
      assert(vGrow <= 1, s"vocab grew $vGrow in one round")
    }
  }

  // ---- q185: the epoch orders decorrelate ----

  test("epoch reshuffle produces near-independent within-shard orders") {
    val agg = Registry.all("q185_epoch_order").fn(spark, sfDir)
      .agg(sum(col("n_pairs")).as("p"), sum(col("n_same_succ")).as("s"))
      .collect()(0)
    val (pairs, same) = (agg.getLong(0), agg.getLong(1))
    assert(pairs > 1000, s"expected a populated comparison, got $pairs")
    // identical orders would give same == pairs; independent
    // permutations give ≈ 1 coincidence per (epoch-pair, shard) cell.
    // 10% is orders of magnitude above the random expectation and
    // orders of magnitude below the affine-hash failure mode.
    assert(same.toDouble / pairs < 0.10,
      s"epoch orders correlated: $same / $pairs successor coincidences")
  }

  // ---- q187: the cluster split never leaks a near-dup pair ----

  test("cluster split leaks zero LSH pairs; the naive split leaks") {
    val pairs = Registry.all("q28_minhash_bands").fn(spark, sfDir)
      .select(col("a_id"), col("b_id"))
    val splitOf = (c: org.apache.spark.sql.Column) =>
      when(pmod(graft.functions.EvmExprs.tokenHash(c.cast("string")),
        lit(10L)) < 9, lit("train")).otherwise(lit("test"))
    val assigned = Registry.all("q101_dedup_clusters").fn(spark, sfDir)
      .select(col("doc_id"), col("canonical"))
      .withColumn("cs", splitOf(col("canonical")))
      .withColumn("ns", splitOf(col("doc_id")))
      .localCheckpoint()
    val a = assigned.select(col("doc_id").as("a_id"), col("cs").as("a_cs"),
      col("ns").as("a_ns"))
    val b = assigned.select(col("doc_id").as("b_id"), col("cs").as("b_cs"),
      col("ns").as("b_ns"))
    val joined = pairs.join(a, "a_id").join(b, "b_id").localCheckpoint()
    val leakedCluster = joined.where(col("a_cs") =!= col("b_cs")).count()
    val leakedNaive = joined.where(col("a_ns") =!= col("b_ns")).count()
    assert(leakedCluster === 0L,
      s"cluster split leaked $leakedCluster near-dup pairs")
    assert(leakedNaive > 0L,
      "expected the naive doc-hash split to leak at least one pair " +
        "(if this corpus stops leaking, the measured contrast is gone)")
    // and the registered aggregate agrees with this recomputation
    val q187 = Registry.all("q187_leakage_split").fn(spark, sfDir)
      .agg(sum(col("n_docs")), sum(col("n_moved"))).collect()(0)
    val nDocs = assigned.count()
    val nMoved = assigned.where(col("cs") =!= col("ns")).count()
    assert(q187.getLong(0) === nDocs)
    assert(q187.getLong(1) === nMoved)
  }

  // ---- q190: online assignment agrees with the incremental dedup ----

  test("online split assignment matches q133's dup verdicts, zero conflicts here") {
    val nDup = Registry.all("q133_incremental_dedup").fn(spark, sfDir)
      .where(col("dup_in_corpus")).count()
    val q190 = Registry.all("q190_split_assign").fn(spark, sfDir)
      .localCheckpoint()
    // "matched" is the same batch↔corpus band-probe + agreement
    // verdict q133 registers — the two queries must count identically
    val matched = q190.where(col("matched"))
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(matched === nDup,
      s"q190 matched $matched docs, q133 flagged $nDup dups")
    // on this corpus no batch doc straddles corpus clusters with
    // different splits, so the online assignment is fully leak-free
    val confl = q190.agg(sum(col("n_conflicted"))).collect()(0).getLong(0)
    assert(confl === 0L, s"$confl conflicted docs — the corpus changed")
  }

  // ---- q191: repetition allocation invariants ----

  test("repeat allocation stays within budget with exact tier arithmetic") {
    val rows = Registry.all("q191_repeat_allocation").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rep, raw, eff) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(Set(1L, 2L, 4L).contains(rep), s"unexpected tier $rep")
      assert(eff === rep * raw,
        s"tier $rep: eff_toks $eff != repeats x raw_toks ${rep * raw}")
    }
    val total = rows.map(_.getLong(3)).sum
    assert(total <= 50000L, s"budget exceeded: $total")
    // valid outcomes: the whole corpus fits (sf0.001 — the budget is
    // not binding), or the fill stops at most one 4x-repeated doc
    // short of the cap (the cumulative sum jumps in repeats*n_toks
    // steps)
    val corpusDocs = graft.queries.Tables.documents(spark, sfDir)
      .where(size(graft.ops.TextAnalysis.tokens(col("text"))) > 0).count()
    val keptDocs = rows.map(_.getLong(1)).sum
    if (keptDocs < corpusDocs) {
      val maxTok = graft.queries.Tables.documents(spark, sfDir)
        .select(max(size(graft.ops.TextAnalysis.tokens(col("text")))))
        .collect()(0).getInt(0).toLong
      assert(total >= 50000L - 4 * maxTok,
        s"budget underfilled: $total with max doc $maxTok toks")
    }
  }
}
