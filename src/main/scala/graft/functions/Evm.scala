package graft.functions

/** EVM bytecode scalar functions, re-implemented from the reference's
  * semantics (not its code):
  *
  *  - [[Evm.extractSkeleton]]  — /root/reference/src/utils/skeleton.rs:8-23
  *  - [[Evm.separateMetadata]] — /root/reference/src/utils/metadata.rs:20-34
  *  - [[Evm.analyzeMetadata]]  — /root/reference/src/utils/metadata.rs:36-102
  *  - [[Evm.opcodes]] / [[Evm.ngrams]] — /root/reference/src/analysys/similarities.rs:113-143
  *
  * All are pure functions on byte arrays so they can be wrapped as Spark
  * UDFs (or promoted to Catalyst expressions) and unit-tested offline
  * against the reference's golden fixtures (test-data/bytecodes*.csv).
  */
object Evm {

  /** Zero out every PUSH1..PUSH32 argument (opcodes 0x60..=0x7f carry
    * `op - 0x5f` immediate bytes, clamped to the remaining length), leaving
    * only the instruction skeleton. Normalizes functionally-identical
    * bytecode that differs only in embedded constants/addresses. */
  def extractSkeleton(code: Array[Byte]): Array[Byte] = {
    val out = code.clone()
    var i = 0
    while (i < out.length) {
      val op = out(i) & 0xff
      i += 1
      if (op >= 0x60 && op <= 0x7f) {
        val n = math.min(op - 0x5f, out.length - i)
        java.util.Arrays.fill(out, i, i + n, 0.toByte)
        i += n
      }
    }
    out
  }

  // CBOR metadata markers: {a1|a2} map header followed by a key of
  // "bzzr0"/"bzzr1" (text(5) = 0x65) or "ipfs" (text(4) = 0x64).
  private val Markers: Array[Array[Byte]] = Array(
    Array(0xa1, 0x65, 'b', 'z', 'z', 'r', '0').map(_.toByte),
    Array(0xa2, 0x65, 'b', 'z', 'z', 'r', '0').map(_.toByte),
    Array(0xa2, 0x65, 'b', 'z', 'z', 'r', '1').map(_.toByte),
    Array(0xa2, 0x64, 'i', 'p', 'f', 's').map(_.toByte))

  /** Split deployed bytecode into (runtime, cborMetadata) at the LAST
    * occurrence of any known CBOR metadata marker; None if absent.
    * Byte-level scan (no UTF-8 mangling). */
  def separateMetadata(code: Array[Byte]): Option[(Array[Byte], Array[Byte])] = {
    var best = -1
    var m = 0
    while (m < Markers.length) {
      val pat = Markers(m)
      var i = code.length - pat.length
      // scan from the end; first hit is the last occurrence of this marker
      var found = -1
      while (i >= 0 && found < 0) {
        var j = 0
        while (j < pat.length && code(i + j) == pat(j)) j += 1
        if (j == pat.length) found = i
        i -= 1
      }
      if (found > best) best = found
      m += 1
    }
    if (best < 0) None
    else Some((java.util.Arrays.copyOfRange(code, 0, best),
      java.util.Arrays.copyOfRange(code, best, code.length)))
  }

  /** Parsed solc CBOR metadata. Mirrors the reference's extraction:
    * compiler version ("solc" key: 3-byte version triple or text),
    * storage protocol + hex hash ("bzzr0"/"bzzr1"/"ipfs"), and the
    * "experimental" flag. Any unknown key invalidates the whole parse
    * (metadata.rs:98). */
  final case class Metadata(
      solcVersion: Option[String],
      storageProtocol: Option[String],
      storageHash: Option[String],
      experimental: Option[Boolean])

  /** Minimal CBOR reader for the subset solc emits: a definite-length map
    * with text keys and byte-string / text / bool values. Returns None on
    * malformed input or unknown keys. */
  def analyzeMetadata(meta: Array[Byte]): Option[Metadata] = {
    if (meta.length < 1) return None
    val major = (meta(0) & 0xff) >>> 5
    if (major != 5) return None // not a map
    val nPairs = meta(0) & 0x1f
    if (nPairs > 23) return None // solc never emits long maps
    var pos = 1
    var solc: Option[String] = None
    var proto: Option[String] = None
    var hash: Option[String] = None
    var exp: Option[Boolean] = None

    def readLen(): Int = { // returns -1 on failure; advances pos
      if (pos >= meta.length) return -1
      val ib = meta(pos) & 0xff
      val minor = ib & 0x1f
      pos += 1
      if (minor < 24) minor
      else if (minor == 24) {
        if (pos >= meta.length) -1 else { val v = meta(pos) & 0xff; pos += 1; v }
      } else if (minor == 25) {
        if (pos + 1 >= meta.length) -1
        else { val v = ((meta(pos) & 0xff) << 8) | (meta(pos + 1) & 0xff); pos += 2; v }
      } else -1
    }

    var k = 0
    while (k < nPairs) {
      if (pos >= meta.length) return None
      val keyMajor = (meta(pos) & 0xff) >>> 5
      if (keyMajor != 3) return None // keys must be text
      val keyLen = readLen()
      if (keyLen < 0 || pos + keyLen > meta.length) return None
      val key = new String(meta, pos, keyLen, java.nio.charset.StandardCharsets.UTF_8)
      pos += keyLen
      if (pos >= meta.length) return None
      val valMajor = (meta(pos) & 0xff) >>> 5
      key match {
        case "bzzr0" | "bzzr1" | "ipfs" =>
          if (valMajor != 2) return None // byte string
          val len = readLen()
          if (len < 0 || pos + len > meta.length) return None
          proto = Some(key)
          hash = Some(Hex.encode(java.util.Arrays.copyOfRange(meta, pos, pos + len)))
          pos += len
        case "solc" =>
          if (valMajor == 2) { // 3-byte version triple
            val len = readLen()
            if (len < 0 || pos + len > meta.length) return None
            if (len == 3)
              solc = Some(s"${meta(pos) & 0xff}.${meta(pos + 1) & 0xff}.${meta(pos + 2) & 0xff}")
            else
              solc = Some(Hex.encode(java.util.Arrays.copyOfRange(meta, pos, pos + len)))
            pos += len
          } else if (valMajor == 3) { // textual version
            val len = readLen()
            if (len < 0 || pos + len > meta.length) return None
            solc = Some(new String(meta, pos, len, java.nio.charset.StandardCharsets.UTF_8))
            pos += len
          } else return None
        case "experimental" =>
          val ib = meta(pos) & 0xff
          if (ib == 0xf5) { exp = Some(true); pos += 1 }
          else if (ib == 0xf4) { exp = Some(false); pos += 1 }
          else return None
        case _ => return None // unknown key invalidates the parse
      }
      k += 1
    }
    Some(Metadata(solc, proto, hash, exp))
  }

  /** Opcode stream of a bytecode: every instruction byte with PUSH
    * arguments skipped (similarities.rs:115-124). */
  def opcodes(code: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](code.length)
    var n = 0
    var i = 0
    while (i < code.length) {
      val op = code(i) & 0xff
      out(n) = code(i)
      n += 1
      i += 1
      if (op >= 0x60 && op <= 0x7f) i += math.min(op - 0x5f, code.length - i)
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Sliding opcode n-grams → frequency map (similarities.rs:113-143).
    * Keys are hex-encoded n-grams so they are joinable/groupable. */
  def ngrams(code: Array[Byte], n: Int): Map[String, Long] = {
    val ops = opcodes(code)
    if (ops.length < n) return Map.empty
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i + n <= ops.length) {
      val key = Hex.encode(java.util.Arrays.copyOfRange(ops, i, i + n))
      m.update(key, m.getOrElse(key, 0L) + 1L)
      i += 1
    }
    m.toMap
  }

  /** Cosine similarity of two n-gram frequency maps
    * (similarities.rs:216-230): dot over shared keys / (‖a‖·‖b‖). */
  def cosine(a: Map[String, Long], b: Map[String, Long]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val (small, large) = if (a.size <= b.size) (a, b) else (b, a)
    var dot = 0.0
    small.foreach { case (k, v) =>
      large.get(k).foreach(w => dot += v.toDouble * w.toDouble)
    }
    val na = math.sqrt(a.valuesIterator.map(v => v.toDouble * v.toDouble).sum)
    val nb = math.sqrt(b.valuesIterator.map(v => v.toDouble * v.toDouble).sum)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
  }

  /** Jaccard similarity of two interface name sets
    * (similarities.rs:233-238): 0 if either side is empty. */
  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val inter = a.intersect(b).size
    val union = a.size + b.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}
