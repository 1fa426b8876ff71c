package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** A4 golden similarity cases (FIXTURES.md; reference
  * similarities.rs:482-516). The two long near-identical skeleton hexes
  * are read out of the reference's own test source at runtime (they are
  * test DATA, ~15 KB each). */
class SimilarityGoldenSpec extends AnyFunSuite {

  private def longGoldenPair(): (Array[Byte], Array[Byte]) = {
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/src/analysys/similarities.rs"))
    val hexes = "\"(0x[0-9a-f]{1000,})\"".r.findAllMatchIn(src).map(_.group(1)).toSeq
    assert(hexes.size == 2, s"expected 2 long golden bytecodes, found ${hexes.size}")
    (Hex.decode(hexes(0)), Hex.decode(hexes(1)))
  }

  test("near-identical skeletons: cosine(n=5) > 0.98 (similarities.rs:482-495)") {
    val (a, b) = longGoldenPair()
    val sim = Evm.cosine(Evm.ngrams(a, 5), Evm.ngrams(b, 5))
    assert(sim > 0.98, s"cosine was $sim")
    assert(sim <= 1.0 + 1e-12)
  }

  test("short bytecodes: cosine(n=2) > 0.83 (similarities.rs:507-516)") {
    val a = Hex.decode("0x6d00000000000000000000000000003318585733ff")
    val b = Hex.decode("0x6e0000000000000000000000000000003318585733ff")
    val sim = Evm.cosine(Evm.ngrams(a, 2), Evm.ngrams(b, 2))
    assert(sim > 0.83, s"cosine was $sim")
  }
}
