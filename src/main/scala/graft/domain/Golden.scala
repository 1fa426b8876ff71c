package graft.domain

/** Pinned bytecode fixtures shared by the entity-pipeline queries and
  * the stub RPC node: a fixed runtime prefix plus the reference's own
  * golden CBOR trailers (the q64 payloads, metadata.rs:112-189), so the
  * keccak skeleton hash and the CBOR metadata decode are constants an
  * oracle can state verbatim while the real expression stack computes
  * them from bytes.
  */
object Golden {

  /** Runtime prefix (PUSH1 80 PUSH1 40 MSTORE PUSH1 0a PUSH1 00 SSTORE)
    * + the reference's golden bzzr0 trailer. Skeleton:
    * 60006000526000600055. */
  val CodeBzzr0 =
    "6080604052600a600055" +
      "a165627a7a72305820202020202042756c6b20536d61736821212120202020203c33203020202020200029"
  val SkelHashBzzr0 = "0x0f38843e5e632009aa852bf3564a2fc5c8c709ebdaf1b35eab32a014cdfc8fe6"
  val StorageHashBzzr0 = "202020202042756c6b20536d61736821212120202020203c3320302020202020"
  /** The normalized skeleton bytecode itself (PUSH data zeroed):
    * 10 bytes — an EVEN byte count, which the stand-in decompiler's
    * variant rule keys on. */
  val SkelHexBzzr0 = "60006000526000600055"

  /** Runtime prefix (… PUSH2 beef …) + the golden ipfs/solc trailer.
    * Skeleton: 6000600052610000600055. */
  val CodeIpfs =
    "608060405261beef600155" +
      "a2646970667358221220aece3e2aea3c94c577aba094d2c5548e8142bc0a311f4a00cda183b42780cc9264736f6c63430008070033"
  val SkelHashIpfs = "0x66d00d94ede9dfd0632895e74cca487171f6dbf2e0133c5e06c30e3ce8ee06e2"
  val StorageHashIpfs = "1220aece3e2aea3c94c577aba094d2c5548e8142bc0a311f4a00cda183b42780cc92"
  /** Normalized skeleton: 11 bytes — ODD byte count (variant rule). */
  val SkelHexIpfs = "6000600052610000600055"
}
