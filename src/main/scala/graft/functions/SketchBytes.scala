package graft.functions

/** Serialized-sketch payload with CONTENT-based equality. Catalyst
  * compares expression trees with the case-class `equals` when it
  * canonicalizes plans and eliminates common subexpressions; a bare
  * `Array[Byte]` field falls back to reference equality, so two probes
  * of the SAME sketch never compare equal and every plan-level
  * dedup/canonicalization opportunity is lost (no wrong results — just
  * re-evaluated probes and unshared plan fragments). Wrapping the
  * bytes restores value semantics: equal bits ⇒ equal expressions. */
final case class SketchBytes(bytes: Array[Byte]) {
  override def equals(o: Any): Boolean = o match {
    case SketchBytes(b) => java.util.Arrays.equals(bytes, b)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
  override def toString: String = s"SketchBytes(${bytes.length}B)"
}
