package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.PqExprs

class PqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // 8-dim vectors → M=4 subspaces × 2 dims, Ksub=4 codebook rows
  // (ids 0–3 seed the books). 4–9 cluster near seeds with noise.
  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0)),
      (3L, Array(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0)),
      (4L, Array(0.9, 0.1, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0)),
      (5L, Array(0.0, 0.9, 0.9, 0.1, 0.0, 0.0, 0.1, 0.0)),
      (6L, Array(0.1, 0.0, 0.0, 0.9, 0.9, 0.0, 0.0, 0.9)),
      (7L, Array(0.0, 0.1, 0.0, 0.0, 0.0, 0.9, 0.9, 0.1)),
      (8L, Array(1.0, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.05)),
      (9L, Array(0.0, 0.0, 0.05, 1.0, 1.0, 0.05, 0.0, 1.0))
    ).toDF("vec_id", "embedding")
  }

  private val M = 4
  private val Ksub = 4

  private def round6(x: Double): Double = PqExprs.round6dp(x)

  private def l2sq(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  test("seedBooks slices the Ksub lowest-id vectors per subspace") {
    val books = Pq.seedBooks(vecs, "vec_id", "embedding", M, Ksub)
    assert(books.length === M)
    assert(books.forall(_.length === Ksub))
    assert(books.forall(_.forall(_.length === 2)))
    // subspace 1 (dims 2–3) of seed 1 is (1.0, 0.0)
    assert(books(1)(1) === Seq(1.0, 0.0))
  }

  test("encode: seeds map to their own code; clusters follow their seed") {
    val books = Pq.seedBooks(vecs, "vec_id", "embedding", M, Ksub)
    val codes = Pq.encodeCodes(vecs, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length === M && c.forall(j => j >= 0 && j < Ksub)))
    // each seed's sub-vectors are distance 0 from their own centroid;
    // fixture has no cross-seed sub-vector ties except all-zero subs,
    // which resolve to the lowest code — verify via reference argmin
    val books2 = books
    val raw = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- raw; s <- 0 until M) {
      val sub = v.slice(s * 2, s * 2 + 2)
      val dists = books2(s).map(c => round6(l2sq(sub, c)))
      val best = dists.zipWithIndex.minBy { case (d, j) => (d, j) }._2
      assert(codes(id)(s) === best, s"vec $id subspace $s")
    }
  }

  test("adcScore equals the rounded subspace-fold against decoded codes") {
    val books = Pq.seedBooks(vecs, "vec_id", "embedding", M, Ksub)
    val codes = Pq.encodeCodes(vecs, "vec_id", "embedding", books)
    val q = Pq.queryTables(vecs.where(col("vec_id") >= 8), "vec_id", "embedding", books)
    val scored = broadcast(q).join(codes, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        PqExprs.adcScore(col("dtab"), col("codes"), Ksub).as("adist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val codeMap = Pq.encodeCodes(vecs, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for (((qid, cid), adist) <- scored) {
      val qv = raw(qid)
      var acc = 0.0
      for (s <- 0 until M)
        acc += round6(l2sq(qv.slice(s * 2, s * 2 + 2), books(s)(codeMap(cid)(s))))
      assert(adist === round6(acc), s"pair ($qid, $cid)")
    }
  }

  test("ADC top-k equals exact L2 top-k when corpus vectors are codebook rows") {
    // corpus = the seeds themselves → reconstruction is lossless, so
    // ADC ordering must equal the exact squared-L2 ordering
    val seeds = vecs.where(col("vec_id") < Ksub)
    val queries = vecs.where(col("vec_id") >= 4)
    val books = Pq.seedBooks(vecs, "vec_id", "embedding", M, Ksub)
    val codes = Pq.encodeCodes(seeds, "vec_id", "embedding", books)
    val approx = Pq.adcTopK(queries, codes, "vec_id", "embedding", books, 2)
      .select(col("q_id"), col("rn"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Pq.l2TopK(queries, seeds, "vec_id", "embedding", 2)
      .select(col("q_id"), col("rn"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(approx === exact)
  }

  test("pqIvfTopK candidates respect probed cells and scores match adcTopK") {
    val books = Pq.seedBooks(vecs, "vec_id", "embedding", M, Ksub)
    val coarse = SimSearch.collectCodebook(
      SimSearch.ivfCentroids(vecs, "vec_id", "embedding", k = 3))
    val ivf = Pq.pqIvfTopK(vecs, col("id") >= 8, "vec_id", "embedding",
        topK = 3, nProbe = 2, coarse, books)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val codes = Pq.encodeCodes(vecs, "vec_id", "embedding", books)
    val full = Pq.adcTopK(vecs.where(col("vec_id") >= 8), codes,
        "vec_id", "embedding", books, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivf.nonEmpty)
    for ((pair, adist) <- ivf)
      assert(full(pair) === adist, s"pair $pair")
  }

  test("trainBooks is deterministic and does not increase quantization distortion") {
    val b1 = Pq.trainBooks(vecs, "vec_id", "embedding", M, Ksub, rounds = 2)
    val b2 = Pq.trainBooks(vecs, "vec_id", "embedding", M, Ksub, rounds = 2)
    assert(b1 === b2)
    val seed = Pq.seedBooks(vecs, "vec_id", "embedding", M, Ksub)
    val raw = vecs.collect().map(_.getSeq[Double](1))
    def distortion(books: Seq[Seq[Seq[Double]]]): Double = {
      var acc = 0.0
      for (v <- raw; s <- 0 until M) {
        val sub = v.slice(s * 2, s * 2 + 2)
        acc += books(s).map(c => round6(l2sq(sub, c))).min
      }
      acc
    }
    assert(distortion(b1) <= distortion(seed))
  }
}
