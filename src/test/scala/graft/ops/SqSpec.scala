package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scalar-quantization contract ([[Sq]]): code range and grid
  * endpoints, reconstruction error bounded by half a step, degenerate
  * dimensions, and the two-stage scan's exactness once the prefilter
  * covers the corpus. */
class SqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // 20 vectors × 4 dims: dim 0 wide range, dim 1 narrow, dim 2
  // CONSTANT (degenerate), dim 3 negative-spanning
  private def vecs = {
    val s = spark
    import s.implicits._
    (0 until 20).map { i =>
      (i.toLong, Seq(i * 10.0, 1.0 + i * 0.01, 7.5, -5.0 + i * 0.5))
    }.toDF("vec_id", "embedding")
  }

  test("codes are 0..255 with grid endpoints at 0 and 255") {
    val (mins, scales, _) = Sq.dimGrid(vecs, "embedding")
    val codes = vecs.select(col("vec_id"),
        Sq.encode(col("embedding"), mins, scales).as("codes"))
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(codes.flatMap(_._2).forall(c => c >= 0L && c <= 255L))
    // the min row encodes to 0 and the max row to 255 on every
    // non-degenerate dim (all four move monotonically with vec_id)
    assert(codes.head._2 === Seq(0L, 0L, 0L, 0L))
    assert(codes.last._2(0) === 255L)
    assert(codes.last._2(3) === 255L)
  }

  test("degenerate dimension: scale 0, code 0, reconstruction = min exactly") {
    val (mins, scales, isteps) = Sq.dimGrid(vecs, "embedding")
    assert(scales(2) === 0.0 && isteps(2) === 0.0)
    assert(mins(2) === 7.5)
    // distance contribution of dim 2 between any two rows is (x−7.5)²
    // with x ≡ 7.5 → zero; check via a self-distance of the constant
    val s = spark
    import s.implicits._
    val one = Seq((1L, Seq(0.0, 0.0, 7.5, 0.0))).toDF("vec_id", "v")
    val d = one.select(Sq.sqDist(col("v"),
        Sq.encode(col("v"), mins, scales), mins, isteps).as("d"))
      .head().getDouble(0)
    // dims 0/1/3 of the probe sit on grid interior points; total
    // reconstruction error is bounded by Σ (istep_i/2)²
    val bound = isteps.map(st => (st / 2) * (st / 2)).sum + 1e-9
    assert(d <= bound)
  }

  test("quantization error ≤ istep/2 per dimension (corpus members)") {
    val (mins, scales, isteps) = Sq.dimGrid(vecs, "embedding")
    val rows = vecs.select(col("embedding"),
        Sq.encode(col("embedding"), mins, scales).as("codes"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val c = r.getSeq[Long](1)
      v.indices.foreach { i =>
        val recon = mins(i) + c(i).toDouble * isteps(i)
        assert(math.abs(v(i) - recon) <= isteps(i) / 2 + 1e-9,
          s"dim $i: x=${v(i)} recon=$recon istep=${isteps(i)}")
      }
    }
  }

  test("rerank with corpus-covering prefilter equals the exact scan") {
    val q = vecs.where(col("vec_id") < 3)
    val exact = Pq.l2TopK(q, vecs, "vec_id", "embedding", 5)
      .select("q_id", "rn", "c_id", "dist").collect().toSet
    val two = Sq.sqRerankTopK(q, vecs, "vec_id", "embedding",
        prefilterK = 19, topK = 5)
      .select("q_id", "rn", "c_id", "dist").collect().toSet
    assert(two === exact)
  }

  test("an all-null dimension fails the grid loudly instead of shifting it") {
    // the r9 advice: the null filter deletes an all-null dimension's
    // rows, after which positional indexing would misalign every later
    // dimension — the guard must turn that into an error, not a shift
    val s = spark
    import s.implicits._
    val withNullDim = (0 until 10).map { i =>
      (i.toLong, Seq(Some(i * 1.0), None, Some(i * 2.0)))
    }.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Sq.dimGrid(withNullDim, "embedding")
    }
    assert(e.getMessage.contains("not dense"))
    // sparse nulls in a live dimension still build a full grid
    val sparseNulls = (0 until 10).map { i =>
      (i.toLong, Seq(Some(i * 1.0), if (i == 3) None else Some(i * 3.0)))
    }.toDF("vec_id", "embedding")
    val (mins, scales, isteps) = Sq.dimGrid(sparseNulls, "embedding")
    assert(mins.size === 2 && scales.size === 2 && isteps.size === 2)
  }

  test("sq top-1 finds the true nearest on a well-separated corpus") {
    // rows are far apart relative to the grid step, so the top-1 of
    // the quantized scan must agree with exact search
    val q = vecs.where(col("vec_id") === 0 || col("vec_id") === 10)
    val sq = Sq.sqTopK(q, vecs, "vec_id", "embedding", 1)
      .select("q_id", "c_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ex = Pq.l2TopK(q, vecs, "vec_id", "embedding", 1)
      .select("q_id", "c_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sq === ex)
  }

  test("slotCos == 6dp cosine of the query slot vs the de-quantized code slice") {
    // the q210 stage-1 kernel: for every (vector, slot) pair, the
    // slice-in-place kernel must equal the independently reconstructed
    // slot cosine (recon = mn + code·istep at the slice offset, the
    // cosSql fold order), including the degenerate constant dimension
    val s = spark
    import s.implicits._
    val (mins, scales, isteps) = Sq.dimGrid(vecs, "embedding")
    val w = 2 // 4 dims → 2 slots of width 2
    val rows = vecs.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val enc = vecs.select(col("vec_id"),
        graft.functions.SqExprs.encode(col("embedding"), mins, scales)
          .as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = for {
      (qid, qv) <- rows; cpos <- 0 until 2
    } yield {
      val qs = qv.slice(0, w) // query slot 0 vs candidate slice cpos
      val codes = enc(qid)
      var dot = 0.0; var qq = 0.0; var cc = 0.0
      for (i <- 0 until w) {
        val recon = mins(cpos * w + i) + codes(cpos * w + i) * isteps(cpos * w + i)
        dot += qs(i) * recon; qq += qs(i) * qs(i); cc += recon * recon
      }
      (qid, cpos, round6(dot / (math.sqrt(qq) * math.sqrt(cc))))
    }
    val got = vecs
      .select(col("vec_id"),
        slice(col("embedding").cast("array<double>"), 1, w).as("qs"),
        graft.functions.SqExprs.encode(col("embedding"), mins, scales)
          .as("codes"))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(1))).as("cpos"),
        col("qs"), col("codes"))
      .select(col("vec_id"), col("cpos"),
        graft.functions.SqExprs.slotCos(col("qs"), col("codes"),
          col("cpos"), mins, isteps, w).as("sc"))
      .as[(Long, Int, Double)].collect()
      .map { case (id, cp, sc) => (id, cp, sc) }.toSet
    assert(got === expect.toSet)
  }

  test("slotCos zero-norm guard: degenerate slots score 0.0, never NaN") {
    // a zero-padded query slot (qq = 0) or a code slice reconstructing
    // to all zeros (cc = 0 — constant-zero dims have mn = istep = 0)
    // must score 0.0: an unguarded division yields NaN, which max()
    // ranks GREATEST in both Spark and DuckDB, silently promoting
    // degenerate candidates into the stage-1 top-C (r11 advice). The
    // q210/q211/q212 oracles mirror the CASE.
    val s = spark
    import s.implicits._
    val mins = Seq(0.0, 0.0, 1.0, 1.0)
    val isteps = Seq(0.0, 0.0, 0.1, 0.1)
    val df = Seq(
      (1L, Seq(0.0, 0.0), Seq(7L, 7L, 3L, 3L)), // zero query slot
      (2L, Seq(1.0, 2.0), Seq(7L, 7L, 3L, 3L))) // slice 0 recons to zeros
      .toDF("id", "qs", "codes")
    val got = df.select(col("id"),
        graft.functions.SqExprs.slotCos(col("qs"), col("codes"), lit(0),
          mins, isteps, 2).as("c0"),
        graft.functions.SqExprs.slotCos(col("qs"), col("codes"), lit(1),
          mins, isteps, 2).as("c1"))
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L) === ((0.0, 0.0)))           // qq = 0 on both slices
    assert(got(2L)._1 === 0.0)                 // cc = 0 on slice 0
    assert(!got(2L)._2.isNaN && got(2L)._2 > 0.9) // healthy slice unaffected
  }
}
