package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class KeccakSpec extends AnyFunSuite {

  test("keccak256 of empty input (public known-answer)") {
    assert(Keccak.hash256Hex(Array.emptyByteArray) ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("keccak256('abc') (public known-answer)") {
    assert(Keccak.hash256Hex("abc".getBytes("UTF-8")) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("rate-boundary inputs (135/136/137 bytes)") {
    // Self-consistency across the absorb boundary: just ensure distinct
    // digests and stable length.
    val d = Seq(135, 136, 137).map(n => Keccak.hash256(Array.fill(n)('a'.toByte)))
    assert(d.map(_.length).forall(_ == 32))
    assert(d.map(Hex.encode).distinct.size == 3)
  }

  test("ERC-20 transfer signature hash (reference function.rs:96-118)") {
    assert(Keccak.sigHash("transfer(address,uint256)") ===
      "0xa9059cbb2ab09eb219583f4a59a5d0623ade346d962bcd4e46b11da047c9049b")
  }

  test("Transfer event topic (reference logs.rs:19,46)") {
    assert(Sig.TransferTopic ===
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
  }

  test("Unresolved_f8b2cb4f() signature hash (reference function.rs:144-160)") {
    assert(Keccak.sigHash("Unresolved_f8b2cb4f()") ===
      "0xc0d559150c15862e872a031a8e11f466df4b16d14e736187f2e7fb162060f9d0")
  }

  test("Unresolved_ selector comes from the name (function.rs:59-63)") {
    assert(Sig.bytes4("Unresolved_f8b2cb4f", Seq.empty) === "f8b2cb4f")
  }

  test("Event_<64hex> hash passthrough (event.rs:15-30)") {
    val h = "c0d559150c15862e872a031a8e11f466df4b16d14e736187f2e7fb162060f9d0"
    assert(Sig.signatureHash(s"Event_$h", Seq.empty, "event") === s"0x$h")
    // the rule is PER KIND (event.rs accepts only Event_, error.rs only
    // Error_, function.rs never embeds): cross-kind names keccak
    assert(Sig.signatureHash(s"Event_$h", Seq.empty, "error") ===
      graft.functions.Keccak.sigHash(s"Event_$h()"))
    assert(Sig.signatureHash(s"Error_$h", Seq.empty, "event") ===
      graft.functions.Keccak.sigHash(s"Error_$h()"))
    assert(Sig.signatureHash(s"Event_$h", Seq.empty) ===
      graft.functions.Keccak.sigHash(s"Event_$h()"))
    assert(Sig.signatureHash(s"Error_$h", Seq.empty, "error") === s"0x$h")
  }

  test("canonical signature build (function.rs:20-27)") {
    assert(Sig.canonical("transferFrom", Seq("address", "address", "uint256")) ===
      "transferFrom(address,address,uint256)")
    assert(Sig.bytes4("transfer", Seq("address", "uint256")) === "a9059cbb")
  }

  test("hex round-trip") {
    val bytes = Array.tabulate(256)(_.toByte)
    assert(Hex.decode(Hex.encode(bytes)).sameElements(bytes))
    assert(Hex.decode("0x00ff").sameElements(Array(0x00.toByte, 0xff.toByte)))
  }
}
