package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Keccak-256 (the pre-NIST-padding variant used by Ethereum), implemented
  * from the public Keccak specification (Keccak-f[1600], rate 1088, pad
  * 0x01…0x80). The reference uses it for ABI signature hashing and skeleton
  * identity (e.g. /root/reference/src/models/function.rs:18-28,
  * /root/reference/src/models/contract_deployment.rs:110-112).
  *
  * Pure JVM code, zero dependencies, so it can run inside whole-stage
  * codegen via [[KeccakExpr]].
  */
object Keccak {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  private val ROTC = Array(1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
    27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44)
  private val PILN = Array(10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
    15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1)

  @inline private def rotl(x: Long, n: Int): Long = (x << n) | (x >>> (64 - n))

  private def keccakF(st: Array[Long]): Unit = {
    val bc = new Array[Long](5)
    var round = 0
    while (round < 24) {
      // theta
      var i = 0
      while (i < 5) { bc(i) = st(i) ^ st(i + 5) ^ st(i + 10) ^ st(i + 15) ^ st(i + 20); i += 1 }
      i = 0
      while (i < 5) {
        val t = bc((i + 4) % 5) ^ rotl(bc((i + 1) % 5), 1)
        var j = 0
        while (j < 25) { st(j + i) ^= t; j += 5 }
        i += 1
      }
      // rho + pi
      var t = st(1)
      i = 0
      while (i < 24) {
        val j = PILN(i)
        val tmp = st(j)
        st(j) = rotl(t, ROTC(i))
        t = tmp
        i += 1
      }
      // chi
      var j = 0
      while (j < 25) {
        i = 0
        while (i < 5) { bc(i) = st(j + i); i += 1 }
        i = 0
        while (i < 5) { st(j + i) = bc(i) ^ (~bc((i + 1) % 5) & bc((i + 2) % 5)); i += 1 }
        j += 5
      }
      // iota
      st(0) ^= RC(round)
      round += 1
    }
  }

  /** keccak-256 of raw bytes → 32-byte digest. */
  def hash256(input: Array[Byte]): Array[Byte] = {
    val rate = 136
    val st = new Array[Long](25)
    val padLen = rate - (input.length % rate)
    val padded = java.util.Arrays.copyOf(input, input.length + padLen)
    padded(input.length) = 0x01
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var b = 0
        val base = off + i * 8
        while (b < 8) { lane |= (padded(base + b).toLong & 0xffL) << (8 * b); b += 1 }
        st(i) ^= lane
        i += 1
      }
      keccakF(st)
      off += rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var b = 0
      while (b < 8) { out(i * 8 + b) = ((st(i) >>> (8 * b)) & 0xffL).toByte; b += 1 }
      i += 1
    }
    out
  }

  def hash256Hex(input: Array[Byte]): String = Hex.encode(hash256(input))

  /** keccak-256 of a UTF-8 string → 0x-prefixed lowercase hex, the
    * reference's signature-hash shape (function.rs:18-28). */
  def sigHash(signature: String): String =
    "0x" + hash256Hex(signature.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Column API: keccak-256 over a BinaryType column. Native Catalyst
    * expression (participates in whole-stage codegen), not a ScalaUDF. */
  def keccak256(c: Column): Column =
    Bridge.column(KeccakExpr(Bridge.expression(c)))
}

/** Catalyst expression wrapper: BinaryType → BinaryType keccak-256. */
case class KeccakExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"keccak256 requires BINARY input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any = Keccak.hash256(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Keccak.hash256($c)")
  override protected def withNewChildInternal(newChild: Expression): KeccakExpr = copy(child = newChild)
}

/** Hex helpers — the reference formats all hashes/addresses/bytecode as
  * lowercase hex strings (SURVEY.md §1.3). */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  def encode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(digits(b >>> 4)).append(digits(b & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Decode hex (with or without 0x prefix, case-insensitive). */
  def decode(s: String): Array[Byte] = {
    val h = if (s.startsWith("0x") || s.startsWith("0X")) s.substring(2) else s
    require(h.length % 2 == 0, s"odd-length hex string (${h.length})")
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(h.charAt(2 * i), 16) << 4) |
        Character.digit(h.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    out
  }
}
