package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5 engine test plan): skeleton idempotence
  * and length preservation (F1), keccak distinctness/stability (F4),
  * similarity invariants (A6/A7), LSH/minhash determinism. */
class PropertySpec extends AnyFunSuite {

  /** Seeded property runner (scalatest⇄scalacheck bridge isn't in the
    * offline cache): 200 deterministic samples per property. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 200).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(42L + i))
        b <- gb.apply(Gen.Parameters.default, Seed(10042L + i))
      } f(a, b)
    }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))
      .map(_.map(_.toByte).toArray))

  test("U2: ABI string codec round-trips arbitrary unicode names") {
    import graft.sources.{Rpc, RpcStub}
    val nameGen: Gen[String] = Gen.chooseNum(0, 80)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf(' ', '_', '-', 'é', 'Ω', '中'))).map(_.mkString))
    forAll(nameGen) { s =>
      assert(Rpc.decodeAbiString(RpcStub.abiEncodeString(s)) === Some(s),
        s"round-trip failed for ${s.map(_.toInt)}")
    }
  }

  test("fused SimHash quarters == the declarative simHashQuarter formulation") {
    // the q121 hot path: the native one-pass expression must agree with
    // the independent Catalyst formulation (transform + aggregate) on
    // texts with dupes, multi-spaces, unicode, and the empty edge
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.TextAnalysis.{tokens, tokenHash, simHashQuarter}
    val texts = Seq("", " ", "a", "a a a", "the quick brown fox",
      "é Ω 中 é Ω", "x  y   z") ++
      (0 until 50).map(i => (0 to i % 17).map(j => s"w${(i * 31 + j) % 13}").mkString(" "))
    val df = texts.toDF("text")
      .withColumn("TH", transform(tokens(col("text")), t => tokenHash(t)))
      .withColumn("QS", graft.functions.EvmExprs.simHashQuartersFromText(col("text")))
    val mismatches = (0 until 4).map { k =>
      df.where(element_at(col("QS"), k + 1) =!= simHashQuarter(col("TH"), k))
        .count()
    }.sum
    assert(mismatches === 0L)
  }

  test("F1: extract_skeleton is idempotent and length-preserving") {
    forAll(bytesGen) { code =>
      val once = Evm.extractSkeleton(code)
      assert(once.length === code.length)
      assert(Evm.extractSkeleton(once).toSeq === once.toSeq)
    }
  }

  test("F1: skeleton erases only PUSH-argument positions") {
    forAll(bytesGen) { code =>
      val sk = Evm.extractSkeleton(code)
      // opcode positions (as walked) are unchanged
      val ops = Evm.opcodes(code).toSeq
      assert(Evm.opcodes(sk).toSeq === ops)
    }
  }

  test("F4: keccak-256 is 32 bytes, deterministic, input-sensitive") {
    forAll(bytesGen, bytesGen) { (a, b) =>
      val ha = Keccak.hash256(a)
      assert(ha.length === 32)
      assert(ha.toSeq === Keccak.hash256(a).toSeq)
      if (a.toSeq != b.toSeq)
        assert(ha.toSeq !== Keccak.hash256(b).toSeq) // no collisions expected at this scale
    }
  }

  test("A6: cosine symmetric, self=1, range [0,1]") {
    val mapGen = Gen.mapOf(Gen.zip(Gen.alphaStr.suchThat(_.nonEmpty),
      Gen.chooseNum(1L, 100L)))
    forAll(mapGen, mapGen) { (a, b) =>
      val s = Evm.cosine(a, b)
      assert(s >= 0.0 && s <= 1.0 + 1e-12)
      assert(math.abs(s - Evm.cosine(b, a)) < 1e-12)
      if (a.nonEmpty) assert(math.abs(Evm.cosine(a, a) - 1.0) < 1e-12)
    }
  }

  test("A7: jaccard symmetric, self=1, empty=0, range [0,1]") {
    val setGen = Gen.containerOf[Set, String](Gen.alphaStr.suchThat(_.nonEmpty))
    forAll(setGen, setGen) { (a, b) =>
      val s = Evm.jaccard(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === Evm.jaccard(b, a))
      if (a.nonEmpty) assert(Evm.jaccard(a, a) === 1.0)
      assert(Evm.jaccard(a, Set.empty) === 0.0)
    }
  }

  test("F2: separate_metadata splits at a marker and reassembles losslessly") {
    forAll(bytesGen) { code =>
      Evm.separateMetadata(code).foreach { case (runtime, meta) =>
        assert(runtime.length + meta.length === code.length)
        assert((runtime ++ meta).toSeq === code.toSeq)
      }
    }
  }

  test("LSH planes are deterministic and in [-0.5, 0.5)") {
    import graft.ops.SimSearch
    for (p <- 0 until 16; i <- 0 until 64) {
      val v = SimSearch.planeComponent(p, i)
      assert(v >= -0.5 && v < 0.5)
      assert(v === SimSearch.planeComponent(p, i))
    }
  }

  test("Sig: bytes4 equals first 4 bytes of the signature hash") {
    forAll(Gen.identifier.suchThat(_.nonEmpty), Gen.listOf(Gen.oneOf("address", "uint256", "bool"))) {
      (name, types) =>
        assert(Sig.bytes4(name, types) === Sig.signatureHash(name, types).substring(2, 10))
    }
  }

  // ---- native expression evaluators vs plain-Scala references ----

  private val tokensGen: Gen[List[String]] =
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 6).flatMap(len =>
        Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString))))

  /** Reference char-fold hash (the TextAnalysis/DuckDB arithmetic). */
  private def refHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)

  test("ShingleHashesExpr == distinct hashes of space-joined 4-shingles") {
    forAll(tokensGen) { toks =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val got = Option(EvmExprs.shingleHashesEval(arr)).map(_.toLongArray().toSet)
      val want =
        if (toks.length < 4) None
        else Some(toks.sliding(4).map(sh => refHash(sh.mkString(" "))).toSet)
      assert(got === want)
    }
  }

  test("MinHashSigExpr minima == mins over reference shingle hashes") {
    val coeffs = Seq((1299721L, 1299827L), (1299833L, 1299709L),
      (1300021L, 1300033L), (1300109L, 1300151L))
    forAll(tokensGen.suchThat(_.length >= 4)) { toks =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val sig = EvmExprs.minHashSigEval(arr).toLongArray()
      val hs = toks.sliding(4).map(sh => refHash(sh.mkString(" "))).toSeq
      coeffs.zipWithIndex.foreach { case ((a, b), j) =>
        assert(sig(j) === hs.map(h => (h * a + b) % 2147483647L).min)
      }
    }
  }

  test("fused text->hashes path == tokenize-then-hash path (spaces, empties)") {
    val textGen: Gen[String] = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.chooseNum(1, 5).flatMap(l => Gen.listOfN(l, Gen.alphaNumChar).map(_.mkString))),
        (2, Gen.const("")))) // empty segments → consecutive spaces
        .map(_.mkString(" ")))
    forAll(textGen) { text =>
      val toks = text.split(' ').filter(_.nonEmpty)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      val twoStepSh = Option(EvmExprs.shingleHashesEval(arr)).map(_.toLongArray().toSeq)
      val fusedSh = Option(EvmExprs.shingleHashesFromTextEval(u)).map(_.toLongArray().toSeq)
      assert(fusedSh === twoStepSh)
      val twoStepSig = Option(EvmExprs.minHashSigEval(arr)).map(_.toLongArray().toSeq)
      val fusedSig = Option(EvmExprs.minHashSigFromTextEval(u)).map(_.toLongArray().toSeq)
      assert(fusedSig === twoStepSig)
    }
  }

  test("DotProductExpr == sequential fold, order-sensitive identical") {
    val vecGen = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 7.0)))
    forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val ga = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray[Any])
      val gb = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray[Any])
      val want = (0 until n).foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      assert(VectorExprs.dotEval(ga, gb) === want)
    }
  }

  // ---- PQ kernel properties (q148/q150/q151/q155 hot path) ----

  private def arr(xs: Seq[Double]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray[Any])
  private val dummy = org.apache.spark.sql.catalyst.expressions.Literal(0)

  /** Random (vector, books) pairs: dim = m·sub, Ksub small; components
    * are dyadic-ish rationals so arithmetic edge cases vary. */
  private val pqGen: Gen[(Seq[Double], Seq[Seq[Seq[Double]]])] = for {
    m <- Gen.chooseNum(1, 4)
    sub <- Gen.chooseNum(1, 5)
    ksub <- Gen.chooseNum(1, 6)
    v <- Gen.listOfN(m * sub, Gen.chooseNum(-1000, 1000).map(_ / 7.0))
    books <- Gen.listOfN(m, Gen.listOfN(ksub,
      Gen.listOfN(sub, Gen.chooseNum(-1000, 1000).map(_ / 7.0))))
  } yield (v, books.map(_.map(_.toSeq).toSeq).toSeq)

  private def round6(x: Double) = PqExprs.round6dp(x)
  private def l2sq(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) {
      val d = a(i) - b(i); acc += d * d; i += 1
    }
    acc
  }

  test("round6dp == Spark round(x, 6) semantics on random doubles") {
    val xGen = Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9).map(x => x / 1234567.0),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, -0.0, 1.0000005, -1.0000005))
    forAll(xGen) { x =>
      val want =
        if (x.isNaN || x.isInfinite) x
        else java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val got = round6(x)
      assert(got === want || (got.isNaN && want.isNaN))
    }
  }

  test("PqEncodeExpr: each code is the rounded-argmin with lower-j ties") {
    forAll(pqGen) { case (v, books) =>
      val sub = books.head.head.length
      val codes = PqEncodeExpr(dummy, books).encode(arr(v))
      for (s <- books.indices) {
        val dists = books(s).map(c =>
          round6(l2sq(v.slice(s * sub, (s + 1) * sub), c)))
        val want = dists.zipWithIndex.minBy { case (d, j) => (d, j) }._2
        assert(codes.getInt(s) === want, s"subspace $s: $dists")
      }
    }
  }

  test("AdcScoreExpr(distTable, encode) == subspace-ordered fold of rounded l2") {
    forAll(pqGen) { case (v, books) =>
      val sub = books.head.head.length
      val ksub = books.head.length
      val dtab = PqDistTableExpr(dummy, books).table(arr(v))
      val codes = PqEncodeExpr(dummy, books).encode(arr(v))
      // the table IS the rounded subspace grid
      for (s <- books.indices; j <- 0 until ksub)
        assert(dtab.getDouble(s * ksub + j) ===
          round6(l2sq(v.slice(s * sub, (s + 1) * sub), books(s)(j))))
      // and the score folds it in subspace order
      var acc = 0.0
      for (s <- books.indices) acc += dtab.getDouble(s * ksub + codes.getInt(s))
      assert(AdcScoreExpr(dummy, dummy, ksub).score(dtab, codes) === round6(acc))
      // self-consistency: scoring a vector against its own codes is the
      // minimal table entry per subspace (the quantization distortion)
      val minSum = books.indices.foldLeft(0.0)((a, s) =>
        a + (0 until ksub).map(j => dtab.getDouble(s * ksub + j)).min)
      assert(AdcScoreExpr(dummy, dummy, ksub).score(dtab, codes) === round6(minSum))
    }
  }

  test("JL plane family: deterministic, in [-0.5, 0.5), and decorrelated across rows") {
    import graft.ops.SimSearch.{jlPlaneComponent, splitmix64}
    forAll(Gen.chooseNum(0, 1 << 20)) { s =>
      assert(splitmix64(s.toLong) === splitmix64(s.toLong))
    }
    val entries = for (p <- 0 until 64; i <- 0 until 64)
      yield jlPlaneComponent(p, i)
    assert(entries.forall(x => x >= -0.5 && x < 0.5))
    assert(math.abs(entries.sum / entries.size) < 0.01) // mean ~0
    // the property the LCG family FAILED (flat-in-d' distortion): row
    // pairs must be near-orthogonal — normalized dot of any two rows
    // stays at the 1/sqrt(64) noise scale, not O(1) structure
    def row(p: Int) = (0 until 64).map(jlPlaneComponent(p, _))
    def ndot(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val coss = for (p <- 0 until 16; q <- (p + 1) until 16)
      yield math.abs(ndot(row(p), row(q)))
    assert(coss.max < 0.5, s"max inter-row |cos| = ${coss.max}")
    assert(coss.sum / coss.size < 0.15, s"mean inter-row |cos| = ${coss.sum / coss.size}")
  }

  test("JL rotated families are independent, not shifted copies; seed 0 unchanged") {
    import graft.ops.SimSearch.jlPlaneComponent
    // the r9 advice: additive seeding made family s, dim i equal
    // family 0, dim i+s on the same plane — rotations were sliding
    // windows of one stream. The mixed seeding must break that
    // identity for every small seed...
    for (s <- 1 to 8; p <- 0 until 4) {
      val rotated = (0 until 56).map(i => jlPlaneComponent(p, i, s.toLong))
      val shifted = (0 until 56).map(i => jlPlaneComponent(p, i + s))
      assert(rotated != shifted, s"seed $s plane $p is a shifted copy of seed 0")
    }
    // ...and rotated rows must be near-orthogonal to the base family's
    def row(p: Int, seed: Long) = (0 until 64).map(jlPlaneComponent(p, _, seed))
    def ndot(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val cross = for (p <- 0 until 8; q <- 0 until 8)
      yield math.abs(ndot(row(p, 0L), row(q, 7L)))
    assert(cross.max < 0.5, s"max cross-family |cos| = ${cross.max}")
    assert(cross.sum / cross.size < 0.15)
    // seed 0 is the historical family (oracles inline its literals):
    // the mix special-cases it bit-identically
    assert(jlPlaneComponent(3, 17) === jlPlaneComponent(3, 17, 0L))
  }

  test("SQ kernels: codes in range, reconstruction ≤ istep/2, dist consistent (random grids)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val corpusGen: Gen[Seq[Seq[Double]]] = for {
      d <- Gen.chooseNum(1, 6)
      n <- Gen.chooseNum(2, 12)
      rows <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-100.0, 100.0)))
    } yield rows.map(r => r :+ 7.25) // append a DEGENERATE constant dim
    forAll(corpusGen) { rows =>
      val d = rows.head.length
      val mins = (0 until d).map(i => rows.map(_(i)).min)
      val maxs = (0 until d).map(i => rows.map(_(i)).max)
      val scales = (0 until d).map(i =>
        if (maxs(i) > mins(i)) 255.0 / (maxs(i) - mins(i)) else 0.0)
      val isteps = (0 until d).map(i =>
        if (maxs(i) > mins(i)) (maxs(i) - mins(i)) / 255.0 else 0.0)
      val child = Literal.create(null,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
      val encE = SqEncodeExpr(child, mins, scales)
      val distE = SqDistExpr(child, child, mins, isteps)
      rows.foreach { v =>
        val codes = encE.enc(new GenericArrayData(v.toArray))
        (0 until d).foreach { i =>
          val c = codes.getLong(i)
          assert(c >= 0L && c <= 255L, s"code $c out of range (dim $i)")
          val recon = mins(i) + c.toDouble * isteps(i)
          val tol = isteps(i) / 2 + 1e-9 * (1 + math.abs(v(i)))
          assert(math.abs(v(i) - recon) <= tol,
            s"dim $i: x=${v(i)} recon=$recon istep=${isteps(i)}")
        }
        // self-distance bound through the full kernel: Σ (istep/2)²,
        // with per-dim FP slack folded in
        val dSelf = distE.dist(new GenericArrayData(v.toArray), codes)
        val bound = isteps.map(st => (st / 2) * (st / 2)).sum + 1e-6
        assert(dSelf <= bound, s"self-dist $dSelf above bound $bound")
      }
      // cross-distance consistency: kernel == independent fold replay
      val qv = rows.head
      val codes = encE.enc(new GenericArrayData(rows.last.toArray))
      val expect = PqExprs.round6dp(
        (0 until d).foldLeft(0.0) { (acc, i) =>
          val recon = mins(i) + codes.getLong(i).toDouble * isteps(i)
          val diff = qv(i) - recon
          acc + diff * diff
        })
      assert(distE.dist(new GenericArrayData(qv.toArray), codes) === expect)
    }
  }

  test("Bloom sketch: no false negatives, serialization-stable, merge = union") {
    import org.apache.spark.util.sketch.BloomFilter
    val keysGen = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)))
    forAll(keysGen, keysGen) { (as, bs) =>
      val a = BloomFilter.create(512, 0.01)
      as.foreach(a.putString)
      assert(as.forall(a.mightContainString), "false negative")
      val rt = BloomExprs.deserialize(BloomExprs.serialize(a))
      assert(as.forall(rt.mightContainString), "round-trip lost keys")
      val b = BloomFilter.create(512, 0.01)
      bs.foreach(b.putString)
      a.mergeInPlace(b)
      assert((as ++ bs).forall(a.mightContainString), "merge lost keys")
    }
  }

  test("tokenHashWide: 60-bit composite of two independent base folds") {
    // the r11 certificate fingerprint: wide = f131·M + f137 where each
    // fN is the (acc·N + codepoint) % M char fold — pinned against an
    // independent Scala fold, plus decomposition and golden values
    val M = 1000000007L
    def fold(base: Long, s: String): Long = {
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * base + cp) % M
        i += Character.charCount(cp)
      }
      acc
    }
    val samples = Seq("", "a", "42:1:17", "1000001:9:40",
      "é Ω 中", "doc:123456789:999999") ++
      (0 until 200).map(i => s"$i:${i * 37 % 101}:${i * i}")
    for (s <- samples) {
      val wide = graft.functions.EvmExprs.tokenHashWideEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(wide === fold(131L, s) * M + fold(137L, s), s)
      // decomposition: both components recoverable and < M
      assert(wide / M === fold(131L, s) && wide % M === fold(137L, s), s)
    }
    // the two folds are genuinely independent discriminators: strings
    // agreeing on one fold (forced via M-period collisions would be
    // astronomical — use distinctness instead) give distinct wides
    val wides = samples.map(s => graft.functions.EvmExprs.tokenHashWideEval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(wides.distinct.size === samples.distinct.size)
  }

}
