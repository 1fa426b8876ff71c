package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.etl.Decompile

/** The reference's OWN compliancy test cases (models/tests.rs
  * check_is_erc20 / check_is_erc721), replayed through our ABI parse +
  * compliancy pipeline: the BNB token ABI must score exactly 6/6 ERC-20
  * signatures and the ENS registrar ABI exactly 9/9 ERC-721 signatures.
  * Fixture JSON extracted verbatim from the reference tests (sanctioned
  * golden-data reuse, same as EvmSpec's CSVs). */
class GoldenAbiSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fixture(name: String): String =
    new String(getClass.getResourceAsStream(s"/$name").readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)

  private def abiRows(hash: String, json: String) = {
    import spark.implicits._
    Decompile.parseAbi(
      Seq((hash, json, false)).toDF("skeleton_hash", "abi_json", "failed_decompilation"))
  }

  test("reference golden: BNB ABI scores erc20_compliancy 6 (models/tests.rs check_is_erc20)") {
    val scores = Similarity.erc20Compliancy(abiRows("0xbnb", fixture("bnb_abi.json")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(scores === Map("0xbnb" -> 6))
  }

  test("reference golden: ENS registrar ABI scores erc721_compliancy 9 (models/tests.rs check_is_erc721)") {
    val scores = Similarity.erc721Compliancy(abiRows("0xens", fixture("erc721_abi.json")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(scores === Map("0xens" -> 9))
  }

  test("embedded-hash rule matches the reference: LAST '_'-segment of an Event_/Error_ name (event.rs get_signature_hash)") {
    val hex = "c0d559150c15862e872a031a8e11f466df4b16d14e736187f2e7fb162060f9d0"
    val hex2 = "aabbccddaabbccddaabbccddaabbccddaabbccddaabbccddaabbccddaabbccdd"
    // distinct hashes — same-signature rows would collapse in the K3 gate
    val json =
      s"""[{"type":"event","name":"Event_Foo_$hex","inputs":[]},
         | {"type":"event","name":"Event_$hex2","inputs":[]},
         | {"type":"event","name":"Event_NotAHash","inputs":[]}]""".stripMargin
    val events = Decompile.signatureEntities(abiRows("0xskel", json))("events")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("signature")).toMap
    // a 64-hex last segment embeds the hash whatever precedes it…
    assert(events(s"Event_Foo_$hex") === s"0x$hex")
    assert(events(s"Event_$hex2") === s"0x$hex2")
    // …and a non-hex tail falls back to the keccak of the canonical form
    // (Sig replays the same rule driver-side, so oracle and relational
    // path can never diverge on it)
    assert(events("Event_NotAHash") ===
      graft.functions.Sig.signatureHash("Event_NotAHash", Nil, "event"))
    assert(graft.functions.Sig.signatureHash(s"Event_Foo_$hex", Nil, "event") === s"0x$hex")
  }

  test("embedded-hash rule is gated per KIND: an error named Event_<64hex> keccaks (event.rs vs error.rs)") {
    val hex = "c0d559150c15862e872a031a8e11f466df4b16d14e736187f2e7fb162060f9d0"
    // cross-kind names: the event carries an Error_ prefix and the
    // error an Event_ prefix — the reference checks the prefix per kind
    // (Event_ only in event.rs, Error_ only in error.rs), so BOTH must
    // get keccak signatures, not embedded hashes
    val json =
      s"""[{"type":"event","name":"Error_$hex","inputs":[]},
         | {"type":"error","name":"Event_$hex","inputs":[]},
         | {"type":"error","name":"Error_$hex","inputs":[]}]""".stripMargin
    val ents = Decompile.signatureEntities(abiRows("0xskel", json))
    val events = ents("events")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("signature")).toMap
    val errors = ents("errors")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("signature")).toMap
    assert(events(s"Error_$hex") ===
      graft.functions.Keccak.sigHash(s"Error_$hex()"))
    assert(errors(s"Event_$hex") ===
      graft.functions.Keccak.sigHash(s"Event_$hex()"))
    // the matching kind still embeds
    assert(errors(s"Error_$hex") === s"0x$hex")
    // the driver-side replay (Enrich.dedupSignatures) agrees row-for-row
    import spark.implicits._
    val abi = abiRows("0xskel", json)
    val deduped = graft.etl.Enrich.dedupSignatures(abi)
      .collect().map(r => (r.getAs[String]("kind"), r.getAs[String]("name")) ->
        r.getAs[String]("signature")).toMap
    assert(deduped(("event", s"Error_$hex")) === events(s"Error_$hex"))
    assert(deduped(("error", s"Event_$hex")) === errors(s"Event_$hex"))
    assert(deduped(("error", s"Error_$hex")) === s"0x$hex")
  }
}
