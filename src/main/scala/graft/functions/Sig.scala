package graft.functions

/** ABI signature functions (reference: src/models/{function,event,error}.rs).
  *
  *  - canonical signature string: `name(type1,type2,...)` (function.rs:20-27)
  *  - signature hash: keccak-256 of the canonical string (function.rs:18-28)
  *  - bytes4 selector: first 4 bytes of the hash (function.rs:59-63)
  *  - unresolved-name short-circuits:
  *      `Unresolved_xxxxxxxx` functions carry their own selector in the name
  *      (function.rs:59-63); `Event_<64hex>` / `Error_<64hex>` carry the full
  *      topic hash (event.rs:15-30, error.rs:15-30).
  */
object Sig {

  def canonical(name: String, inputTypes: Seq[String]): String =
    name + "(" + inputTypes.mkString(",") + ")"

  private val Unresolved = "^Unresolved_([0-9a-fA-F]{8})$".r
  // the embedded-hash rule is PER KIND: event.rs (get_signature_hash)
  // accepts only the Event_ prefix, error.rs only Error_, and
  // function.rs has no embed rule at all — an error named
  // Event_<64hex> keccaks like any other name. The LAST '_'-separated
  // segment carries the hash (Event_Foo_<64hex> embeds too); requiring
  // 64 HEX chars is a deliberate tightening of the reference's
  // panic-on-non-hex path. Mirrors Decompile.signatureEntities — the
  // relational twin of this driver-side rule.
  private val EmbeddedEvent = "^Event_(?:.*_)?([0-9a-fA-F]{64})$".r
  private val EmbeddedError = "^Error_(?:.*_)?([0-9a-fA-F]{64})$".r

  /** Full 32-byte signature hash of an ABI entry of `kind`
    * ("function" | "event" | "error"), honoring that kind's
    * embedded-hash short-circuit. Returns 0x-prefixed lowercase hex. */
  def signatureHash(name: String, inputTypes: Seq[String],
      kind: String = "function"): String = {
    val embedded = kind match {
      case "event" => EmbeddedEvent.findFirstMatchIn(name).map(_.group(1))
      case "error" => EmbeddedError.findFirstMatchIn(name).map(_.group(1))
      case _       => None
    }
    embedded.map("0x" + _.toLowerCase)
      .getOrElse(Keccak.sigHash(canonical(name, inputTypes)))
  }

  /** 4-byte selector (8 hex chars, no 0x): from an `Unresolved_xxxxxxxx`
    * name directly, else first 4 bytes of the keccak signature hash
    * (selectors are a FUNCTION concept — no embed rule applies, same as
    * Decompile's bytes4 projection). */
  def bytes4(name: String, inputTypes: Seq[String]): String = name match {
    case Unresolved(sel) => sel.toLowerCase
    case _               => Keccak.sigHash(canonical(name, inputTypes)).substring(2, 10)
  }

  /** Transaction-input selector: hex chars [2,10) of the input when the
    * calldata is at least 4 bytes (transaction.rs:59-63, 338-342). */
  def txBytes4(input: String): Option[String] =
    if (input != null && input.length >= 10) Some(input.substring(2, 10)) else None

  /** keccak("Transfer(address,address,uint256)") — the ERC-20/721 Transfer
    * topic the reference filters logs on (logs.rs:19,46). */
  val TransferTopic: String = Keccak.sigHash("Transfer(address,address,uint256)")

  /** The zero address used as `to` default for contract creations
    * (transaction.rs:38-43). */
  val ZeroAddress: String = "0x" + "0" * 40
}
