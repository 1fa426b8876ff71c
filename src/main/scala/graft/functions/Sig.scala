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
  // the reference checks the Event_/Error_ PREFIX and takes the LAST
  // '_'-separated segment when it is 64 hex chars (event.rs
  // get_signature_hash) — Event_Foo_<64hex> embeds its hash too
  private val EmbeddedHash = "^(?:Event|Error)_(?:.*_)?([0-9a-fA-F]{64})$".r

  /** Full 32-byte signature hash, honoring the unresolved-name
    * short-circuits. Returns 0x-prefixed lowercase hex. */
  def signatureHash(name: String, inputTypes: Seq[String]): String = name match {
    case EmbeddedHash(h) => "0x" + h.toLowerCase
    case _               => Keccak.sigHash(canonical(name, inputTypes))
  }

  /** 4-byte selector (8 hex chars, no 0x): from an `Unresolved_xxxxxxxx`
    * name directly, else first 4 bytes of the signature hash. */
  def bytes4(name: String, inputTypes: Seq[String]): String = name match {
    case Unresolved(sel) => sel.toLowerCase
    case _               => signatureHash(name, inputTypes).substring(2, 10)
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
