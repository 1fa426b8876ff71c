package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot-path EVM scalars (SURVEY
  * §7.4: promote UDFs to codegen expressions for perf). Compared to
  * ScalaUDF these skip the catalyst⇄scala converters and null-handling
  * closure — the generated code calls the static evaluator directly
  * inside whole-stage codegen. */
object EvmExprs {

  /** Static evaluators referenced from generated code. */
  def skeletonHashEval(hex: UTF8String): UTF8String = {
    val code = Hex.decode(hex.toString)
    val runtime = Evm.separateMetadata(code).map(_._1).getOrElse(code)
    UTF8String.fromString("0x" + Hex.encode(Keccak.hash256(Evm.extractSkeleton(runtime))))
  }

  def hexToDecEval(hex: UTF8String): UTF8String = {
    val h0 = hex.toString
    val h = if (h0.startsWith("0x") || h0.startsWith("0X")) h0.substring(2) else h0
    UTF8String.fromString(
      if (h.isEmpty) "0" else new java.math.BigInteger(h, 16).toString)
  }

  /** Char-fold hash matching graft.ops.TextAnalysis.tokenHash:
    * (acc*31 + codepoint) % 1e9+7 over the string's characters — the
    * arithmetic DuckDB oracles reproduce with list_reduce/ascii. */
  def tokenHashEval(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** 60-bit composite char-fold hash — the certificate fingerprint
    * (r10 advice: a single (acc·31+cp) % HashMod fold is ~30 bits,
    * birthday-weak for an integrity checksum). Two INDEPENDENT folds
    * over the same codepoints with the spanHashes bases 131/137,
    * combined as f₁₃₁·HashMod + f₁₃₇ — both folds and the combination
    * stay under int64, so DuckDB replays the exact arithmetic
    * ([[graft.ops.TextAnalysis.spanHashes]] precedent). */
  def tokenHashWideEval(s: UTF8String): Long = {
    val str = s.toString
    var a = 0L
    var b = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      a = (a * 131L + cp) % 1000000007L
      b = (b * 137L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    a * 1000000007L + b
  }

  private val CoeffA = Array(1299721L, 1299833L, 1300021L, 1300109L)
  private val CoeffB = Array(1299827L, 1299709L, 1300033L, 1300151L)
  private val MinHashP = 2147483647L
  private val HashMod = 1000000007L

  /** Fused 4-way MinHash signature over word-token arrays: 4-token
    * shingles hashed with the tokenHash char fold (spaces included, no
    * string allocation), each updating the four (a*h+b)%P minima in one
    * pass. Equivalent to min over hashes of DISTINCT shingles — dupes
    * can't change a minimum. Null when fewer than 4 tokens (no
    * shingles), matching the `size(H) > 0` guard. The interpreted
    * higher-order formulation (transform+array_min x4 over an exploded
    * shingle hash array) was the q28 bench bottleneck. */
  /** Token arrays normally come from split()/filter() and never hold
    * nulls, but the input type admits them — treat an array with any
    * null token as null output rather than NPE-ing the task. */
  private def anyNullElement(arr: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }

  def minHashSigEval(arr: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < 4 || anyNullElement(arr)) return null
    val mins = Array.fill(4)(Long.MaxValue)
    var i = 0
    while (i + 4 <= n) {
      var acc = 0L
      var k = 0
      while (k < 4) {
        if (k > 0) acc = (acc * 31L + 32L) % HashMod // the ' ' joiner
        val t = arr.getUTF8String(i + k).toString
        var j = 0
        while (j < t.length) {
          val cp = t.codePointAt(j)
          acc = (acc * 31L + cp) % HashMod
          j += Character.charCount(cp)
        }
        k += 1
      }
      var c = 0
      while (c < 4) {
        val v = (acc * CoeffA(c) + CoeffB(c)) % MinHashP
        if (v < mins(c)) mins(c) = v
        c += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Fused distinct-shingle hashing: 4-token shingles hashed with the
    * tokenHash char fold (space joiner folded in, no string allocation),
    * deduplicated. Equals the oracle's
    * `list_distinct(list_transform(shingles(T), tokenHash))` because
    * dedup-then-hash and hash-then-dedup differ only when two distinct
    * shingles collide — and then both engines compute the identical
    * colliding value. Null when fewer than 4 tokens. Output order is
    * ascending (callers explode it; order is immaterial). */
  def shingleHashesEval(arr: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < 4 || anyNullElement(arr)) return null
    val hs = new Array[Long](n - 3)
    var i = 0
    while (i + 4 <= n) {
      var acc = 0L
      var k = 0
      while (k < 4) {
        if (k > 0) acc = (acc * 31L + 32L) % HashMod // the ' ' joiner
        val t = arr.getUTF8String(i + k).toString
        var j = 0
        while (j < t.length) {
          val cp = t.codePointAt(j)
          acc = (acc * 31L + cp) % HashMod
          j += Character.charCount(cp)
        }
        k += 1
      }
      hs(i) = acc
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** split-on-single-space, drop empties — exactly
    * `filter(split(text, ' '), t -> t <> '')` (the tokens() semantics
    * every text oracle mirrors). */
  private def tokenize(text: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) out += text.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  private def foldToken(acc0: Long, t: String): Long = {
    var acc = acc0
    var j = 0
    while (j < t.length) {
      val cp = t.codePointAt(j)
      acc = (acc * 31L + cp) % HashMod
      j += Character.charCount(cp)
    }
    acc
  }

  /** Shingle hash of tokens [i, i+4) with the ' ' joiner folded in. */
  private def shingleHash(toks: Array[String], i: Int): Long = {
    var acc = 0L
    var k = 0
    while (k < 4) {
      if (k > 0) acc = (acc * 31L + 32L) % HashMod
      acc = foldToken(acc, toks(i + k))
      k += 1
    }
    acc
  }

  /** Fused text → distinct 4-token-shingle hashes (tokenize + shingle
    * + hash in one pass; no token/shingle array materialization). */
  def shingleHashesFromTextEval(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(text.toString)
    val n = toks.length
    if (n < 4) return null
    val hs = new Array[Long](n - 3)
    var i = 0
    while (i + 4 <= n) { hs(i) = shingleHash(toks, i); i += 1 }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Fused text → 4-way MinHash signature (same arithmetic as
    * [[minHashSigEval]] over tokenized text). */
  def minHashSigFromTextEval(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(text.toString)
    val n = toks.length
    if (n < 4) return null
    val mins = Array.fill(4)(Long.MaxValue)
    var i = 0
    while (i + 4 <= n) {
      val h = shingleHash(toks, i)
      var c = 0
      while (c < 4) {
        val v = (h * CoeffA(c) + CoeffB(c)) % MinHashP
        if (v < mins(c)) mins(c) = v
        c += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Fused text → the four 16-bit SimHash quarters (the q121 wide
    * fingerprint): tokenize + char-fold token hash + the 4-way affine
    * remix + all 64 bit counters in ONE pass over the tokens. The
    * declarative formulation (4 quarters × 16 bits = 64 interpreted
    * `aggregate()` traversals of the token-hash array per row) was the
    * q121 bench bottleneck — same story as the MinHash signature.
    * Arithmetic is exactly [[graft.ops.TextAnalysis.simHashQuarter]]'s:
    * quarter k bit j set when Σ ±1 over bit j of (h·a_k + b_k) mod P is
    * positive, token MULTISET (dupes count). Empty token list → all
    * counters 0 → quarters 0, matching the oracle's NULL list_sum →
    * CASE false path. */
  def simHashQuartersFromTextEval(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(text.toString)
    val counts = new Array[Int](64) // [k*16 + j]
    var i = 0
    while (i < toks.length) {
      val h = foldToken(0L, toks(i))
      var k = 0
      while (k < 4) {
        val m = (h * CoeffA(k) + CoeffB(k)) % MinHashP
        var j = 0
        while (j < 16) {
          counts(k * 16 + j) += (((m >> j) & 1L).toInt * 2 - 1)
          j += 1
        }
        k += 1
      }
      i += 1
    }
    val qs = new Array[Long](4)
    var k = 0
    while (k < 4) {
      var q = 0L
      var j = 0
      while (j < 16) {
        if (counts(k * 16 + j) > 0) q |= (1L << j)
        j += 1
      }
      qs(k) = q
      k += 1
    }
    new GenericArrayData(qs)
  }

  /** Column API. */
  def skeletonHash(c: Column): Column = Bridge.column(SkeletonHashExpr(Bridge.expression(c)))
  def hexToDec(c: Column): Column = Bridge.column(HexToDecExpr(Bridge.expression(c)))
  def tokenHash(c: Column): Column = Bridge.column(TokenHashExpr(Bridge.expression(c)))
  def tokenHashWide(c: Column): Column = Bridge.column(TokenHashWideExpr(Bridge.expression(c)))
  def minHashSig(c: Column): Column = Bridge.column(MinHashSigExpr(Bridge.expression(c)))
  def shingleHashes(c: Column): Column = Bridge.column(ShingleHashesExpr(Bridge.expression(c)))
  def shingleHashesFromText(c: Column): Column =
    Bridge.column(ShingleHashesFromTextExpr(Bridge.expression(c)))
  def minHashSigFromText(c: Column): Column =
    Bridge.column(MinHashSigFromTextExpr(Bridge.expression(c)))
  def simHashQuartersFromText(c: Column): Column =
    Bridge.column(SimHashQuartersFromTextExpr(Bridge.expression(c)))
}

/** STRING text → array<long>(4) of 16-bit SimHash quarters, fused. */
case class SimHashQuartersFromTextExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash_quarters_text needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    EvmExprs.simHashQuartersFromTextEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmExprs.simHashQuartersFromTextEval($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashQuartersFromTextExpr =
    copy(child = newChild)
}

/** STRING text → array<long> distinct shingle hashes, tokenize fused. */
case class ShingleHashesFromTextExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"shingle_hashes_text needs STRING, got ${child.dataType}")
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    EvmExprs.shingleHashesFromTextEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.EvmExprs.shingleHashesFromTextEval($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesFromTextExpr =
    copy(child = newChild)
}

/** STRING text → array<long>(4) MinHash signature, tokenize fused. */
case class MinHashSigFromTextExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash_sig_text needs STRING, got ${child.dataType}")
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    EvmExprs.minHashSigFromTextEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.EvmExprs.minHashSigFromTextEval($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigFromTextExpr =
    copy(child = newChild)
}

/** hex bytecode (0x-optional STRING) → 0x-prefixed keccak of its
  * normalized skeleton (contract_deployment.rs:110-112 semantics). */
case class SkeletonHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"skeleton_hash needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    EvmExprs.skeletonHashEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmExprs.skeletonHashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): SkeletonHashExpr =
    copy(child = newChild)
}

/** uint256 hex word (0x-optional STRING) → decimal string (§1.3's
  * string-typed money columns). */
case class HexToDecExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"hex_to_dec needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    EvmExprs.hexToDecEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmExprs.hexToDecEval($c)")
  override protected def withNewChildInternal(newChild: Expression): HexToDecExpr =
    copy(child = newChild)
}

/** String → char-fold hash (the TextAnalysis.tokenHash arithmetic as a
  * native expression: higher-order-function formulations are interpreted
  * per element, which dominated the MinHash signature stage). */
case class TokenHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"token_hash needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    EvmExprs.tokenHashEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmExprs.tokenHashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashExpr =
    copy(child = newChild)
}

/** STRING → 60-bit composite fingerprint (two-base char fold). */
case class TokenHashWideExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"token_hash_wide needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    EvmExprs.tokenHashWideEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmExprs.tokenHashWideEval($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashWideExpr =
    copy(child = newChild)
}

/** array<string> tokens → array<long> distinct 4-token shingle hashes. */
case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs ARRAY<STRING>, got $t")
  }
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    EvmExprs.shingleHashesEval(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.EvmExprs.shingleHashesEval($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** array<string> tokens → array<long>(4) fused MinHash signature. */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs ARRAY<STRING>, got $t")
  }
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    EvmExprs.minHashSigEval(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.EvmExprs.minHashSigEval($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
    code
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
