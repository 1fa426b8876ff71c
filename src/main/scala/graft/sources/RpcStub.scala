package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Deterministic local JSON-RPC stand-in for the zero-egress sandbox
  * (the same sanction as the stand-in decompiler script in
  * [[graft.queries.ExternalOps]]): a real node is unreachable here, so
  * the node behind the socket is synthetic — but the HTTP hop, JSON
  * envelope, hex-quantity decode, pagination, and failure paths in
  * [[Rpc]] are all real.
  *
  * Served methods, all answered by closed-form rules over the block
  * number so the DuckDB oracle can replay them in SQL:
  *
  *  - `eth_call` (`name()` selector): addresses whose last digit is
  *    divisible by 3 return an RPC error, every other address resolves
  *    to `"C" + last-4-chars`, ABI-encoded as a Solidity `string`.
  *  - `eth_blockNumber`: the chain head, fixed at [[Head]]
  *    (the reference's sync target, stream.rs:286-300).
  *  - `eth_getBlockByNumber(n, full=true)`: a block object with its
  *    full transaction list (blocks.rs:6-18 `get_block_with_txs`);
  *    `result: null` past the head — the reference's "block not
  *    available yet" termination marker (stream.rs:316-321).
  *  - `trace_block(n)`: the block's execution traces, three levels
  *    deep, with `error` set on SOME roots and mid-level traces but
  *    never pre-propagated — propagation to descendants is the
  *    engine's job (traces.rs:6-34).
  */
object RpcStub {

  /** Default chain head answered by eth_blockNumber (stream.rs:286-300). */
  val Head = 750L

  /** The live head — advanceable so tests can exercise the reference's
    * subscribe-and-follow mode (stream.rs:360-373): a "new block" is the
    * head moving past what's indexed. Reset to [[Head]] after mutating. */
  private val headRef = new java.util.concurrent.atomic.AtomicLong(Head)
  def head: Long = headRef.get
  def setHead(n: Long): Unit = headRef.set(n)

  // ---- the block rule (mirrored by the q95 oracle SQL) ----
  def timestampOf(n: Long): Long = 1438269973L + 12L * n
  def gasUsedOf(n: Long): Long = (n * 7919L) % 30000000L
  val GasLimit = 30000000L
  def baseFeeOf(n: Long): Long = (n * 104729L) % 1000000000000L
  def minerOf(n: Long): String = f"0x${(n * 2654435761L) % 1099511627776L}%040x"
  def txCountOf(n: Long): Int = (n % 13L).toInt

  // ---- the withdrawal rule (block.rs:323-339's nested entity) ----
  def wdCountOf(n: Long): Int = (n % 5L).toInt
  def wdIndexOf(n: Long, k: Int): Long = n * 16L + k
  def wdValidatorOf(n: Long, k: Int): Long = (n * 3L + k) % 1000L
  def wdAddressOf(n: Long, k: Int): String = f"0x${n * 13L + k + 5}%040x"
  def wdAmountOf(n: Long, k: Int): Long = n * 1000000L + k * 997L

  // ---- the transaction rule ----
  def txHashOf(n: Long, i: Int): String = f"0x${n * 100000L + i}%064x"
  def txFromOf(n: Long, i: Int): String = f"0x${n * 31L + i + 1}%040x"
  def txToOf(n: Long, i: Int): String = f"0x${n * 37L + i + 2}%040x"
  /** n·10¹⁸ + i wei — deliberately past 64 bits so the uint256 decode
    * path is exercised (transaction.rs:382's decimal-string contract). */
  def txValueOf(n: Long, i: Int): java.math.BigInteger =
    java.math.BigInteger.valueOf(n)
      .multiply(java.math.BigInteger.TEN.pow(18))
      .add(java.math.BigInteger.valueOf(i.toLong))
  def txGasOf(i: Int): Long = 21000L + i
  /** wei; +1 keeps it nonzero so min/avg stay meaningful */
  def txGasPriceOf(n: Long, i: Int): Long = (n * 131L + i * 17L) % 1000000000000L + 1L
  /** every third tx is an ERC-20 transfer(to, …) call — bytes4
    * a9059cbb (transaction.rs:59-63's selector projection). */
  def txInputOf(n: Long, i: Int): String =
    if (i % 3 == 0) "0xa9059cbb" + f"${n * 37L + i + 2}%064x" else "0x"

  // ---- signature + EIP-1559 parity rules (transaction.rs:394-409):
  // nonce/v as hex quantities, r/s as 32-byte words; only every second
  // tx is type-2 — legacy txs OMIT the fee-cap fields, so the fetch
  // face must decode absent JSON members to null ----
  def txNonceOf(n: Long, i: Int): Long = n * 3L + i
  def txROf(n: Long, i: Int): String = f"0x${n * 100003L + i}%064x"
  def txSOf(n: Long, i: Int): String = f"0x${n * 99991L + i}%064x"
  /** legacy recovery id 27/28 by parity */
  def txVOf(n: Long, i: Int): Long = 27L + ((n + i) % 2L)
  def txIs1559(i: Int): Boolean = i % 2 == 1
  def txMaxFeeOf(n: Long, i: Int): Long = (n * 151L + i * 19L) % 1000000000000L + 2L
  def txMaxPriorityOf(n: Long, i: Int): Long = (n * 7L + i * 3L) % 1000000000L + 1L

  // ---- block difficulty/size rules (block.rs:294 difficulty as a U256
  // decimal string, block.rs:320-322 size): difficulty deliberately
  // past 64 bits so the uint256 decode path carries it ----
  def difficultyOf(n: Long): java.math.BigInteger =
    java.math.BigInteger.valueOf(n)
      .multiply(java.math.BigInteger.TEN.pow(19))
      .add(java.math.BigInteger.valueOf(7L))
  def sizeOf(n: Long): Long = (n * 331L) % 100000L + 500L

  // ---- the trace rule (errors only where stated; NO pre-propagation) ----
  /** children of tx i's root trace */
  def subCountOf(i: Int): Int = i % 3
  /** grandchildren of child j (depth-3 paths exercise prefix walks) */
  def grandCountOf(j: Int): Int = j % 2
  def rootErrored(n: Long, i: Int): Boolean = (n + i) % 7L == 0L
  def childErrored(n: Long, i: Int, j: Int): Boolean = (n + i + j) % 11L == 0L

  // ---- the creation rule: some roots are `create` traces carrying the
  // pinned golden bytecode (graft.domain.Golden), so the downstream
  // skeleton/CBOR pipeline runs on real bytes the oracle can pin ----
  def isCreate(i: Int): Boolean = i % 4 == 1
  def createdAddressOf(n: Long, i: Int): String = f"0x${n * 61L + i}%040x"
  def createdCodeOf(n: Long, i: Int): String =
    if ((n + i) % 2L == 0L) graft.domain.Golden.CodeBzzr0
    else graft.domain.Golden.CodeIpfs

  // ---- the destruction rule: SELFDESTRUCT roots
  // (contract_destruction.rs:33-59). The destroyed contract is the one
  // CREATED (i%5+1) blocks earlier by tx i-2 — when that block had such
  // a tx the deploy×destroy pair exists with lifetime i%5+1 blocks;
  // when not, it's an unpaired destruction (both shapes are real) ----
  def isSuicide(i: Int): Boolean = i % 4 == 3
  def destroyedAddressOf(n: Long, i: Int): String =
    f"0x${(n - (i % 5 + 1)) * 61L + (i - 2)}%040x"
  def refundAddressOf(n: Long, i: Int): String = f"0x${n * 71L + i}%040x"
  def balanceOf(n: Long, i: Int): Long = n * 500L + i

  private def hexQty(v: Long): String = "0x" + java.lang.Long.toHexString(v)
  private def word(v: Long): String = f"0x$v%064x"

  // ---- the log rule (logs.rs:30-60 per-block eth_getLogs): tx i%4==2
  // emits an ERC-20 Transfer (3 topics, value in the data word),
  // i%4==0 an ERC-721 Transfer (4 topics, token_id in topic_3), the
  // rest a non-Transfer topic the decoder must drop ----
  def logContractOf(n: Long, i: Int): String = f"0x${n * 73L + i}%040x"
  def transferValueOf(n: Long, i: Int): Long = n * 10000L + i
  def tokenIdOf(n: Long, i: Int): Long = n * 100L + i
  val OtherTopic: String = "0x" + "ee" * 32

  /** The eth_getLogs result array for one block, or None past the head. */
  def logsJson(n: Long): Option[String] = {
    if (n > head) return None
    val out = (0 until txCountOf(n)).map { i =>
      val transferTopic = graft.functions.Sig.TransferTopic
      val (topics, data) = (i % 4) match {
        case 2 => (Seq(transferTopic, word(n * 31L + i + 1), word(n * 37L + i + 2)),
          word(transferValueOf(n, i)))
        case 0 => (Seq(transferTopic, word(n * 31L + i + 1), word(n * 37L + i + 2),
          word(tokenIdOf(n, i))), "0x")
        case _ => (Seq(OtherTopic), "0x")
      }
      s"""{"address":"${logContractOf(n, i)}","topics":[${topics.map(t => s""""$t"""").mkString(",")}],""" +
        s""""data":"$data","blockNumber":"${hexQty(n)}","transactionHash":"${txHashOf(n, i)}",""" +
        s""""transactionIndex":"${hexQty(i.toLong)}","logIndex":"${hexQty(i.toLong)}","removed":false}"""
    }
    Some("[" + out.mkString(",") + "]")
  }

  /** The eth_getBlockByNumber result object, or None past the head. */
  def blockJson(n: Long): Option[String] = {
    if (n > head) return None
    val txs = (0 until txCountOf(n)).map { i =>
      val feeCaps =
        if (txIs1559(i))
          s""""maxFeePerGas":"${hexQty(txMaxFeeOf(n, i))}","maxPriorityFeePerGas":"${hexQty(txMaxPriorityOf(n, i))}","""
        else ""
      s"""{"hash":"${txHashOf(n, i)}","from":"${txFromOf(n, i)}","to":"${txToOf(n, i)}",""" +
        s""""value":"0x${txValueOf(n, i).toString(16)}","gas":"${hexQty(txGasOf(i))}",""" +
        s""""gasPrice":"${hexQty(txGasPriceOf(n, i))}","input":"${txInputOf(n, i)}",""" +
        s""""nonce":"${hexQty(txNonceOf(n, i))}","r":"${txROf(n, i)}","s":"${txSOf(n, i)}",""" +
        feeCaps +
        s""""v":"${hexQty(txVOf(n, i))}"}"""
    }.mkString(",")
    val wds = (0 until wdCountOf(n)).map { k =>
      s"""{"index":"${hexQty(wdIndexOf(n, k))}","validatorIndex":"${hexQty(wdValidatorOf(n, k))}",""" +
        s""""address":"${wdAddressOf(n, k)}","amount":"${hexQty(wdAmountOf(n, k))}"}"""
    }.mkString(",")
    Some(
      s"""{"number":"${hexQty(n)}","timestamp":"${hexQty(timestampOf(n))}",""" +
        s""""gasUsed":"${hexQty(gasUsedOf(n))}","gasLimit":"${hexQty(GasLimit)}",""" +
        s""""baseFeePerGas":"${hexQty(baseFeeOf(n))}","miner":"${minerOf(n)}",""" +
        s""""difficulty":"0x${difficultyOf(n).toString(16)}","size":"${hexQty(sizeOf(n))}",""" +
        s""""transactions":[$txs],"withdrawals":[$wds]}""")
  }

  /** The trace_block result array, or None past the head. Parity-style
    * trace objects: traceAddress path, subtraces count, optional error. */
  def tracesJson(n: Long): Option[String] = {
    if (n > head) return None
    val out = Seq.newBuilder[String]
    def trace(i: Int, path: Seq[Int], subtraces: Int, error: Option[String],
        kind: String = "call"): String = {
      val err = error.map(e => s""""error":"$e",""").getOrElse("")
      val action = kind match {
        case "create" =>
          s""""action":{"from":"${txFromOf(n, i)}","init":"0x${createdCodeOf(n, i)}"}"""
        case "suicide" =>
          s""""action":{"address":"${destroyedAddressOf(n, i)}","refundAddress":"${refundAddressOf(n, i)}","balance":"${hexQty(balanceOf(n, i))}"}"""
        case _ =>
          s""""action":{"from":"${txFromOf(n, i)}","to":"${txToOf(n, i)}"}"""
      }
      val result =
        if (kind == "create")
          s""""result":{"address":"${createdAddressOf(n, i)}","code":"0x${createdCodeOf(n, i)}"},"""
        else ""
      s"""{$action,$err$result""" +
        s""""traceAddress":[${path.mkString(",")}],"subtraces":$subtraces,""" +
        s""""transactionHash":"${txHashOf(n, i)}","transactionPosition":$i,""" +
        s""""type":"$kind"}"""
    }
    for (i <- 0 until txCountOf(n)) {
      val subs = subCountOf(i)
      val kind =
        if (isCreate(i)) "create" else if (isSuicide(i)) "suicide" else "call"
      out += trace(i, Nil, subs,
        if (rootErrored(n, i)) Some("Reverted") else None, kind = kind)
      for (j <- 0 until subs) {
        val grands = grandCountOf(j)
        out += trace(i, Seq(j), grands,
          if (childErrored(n, i, j)) Some("Reverted") else None)
        for (k <- 0 until grands)
          out += trace(i, Seq(j, k), 0, None)
      }
    }
    Some("[" + out.result().mkString(",") + "]")
  }

  /** ABI-encode a string return: offset word + length word + padded data. */
  def abiEncodeString(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val data = graft.functions.Hex.encode(bytes)
    val padded = data + "0" * ((64 - data.length % 64) % 64)
    "0x" + f"${32}%064x" + f"${bytes.length}%064x" + padded
  }

  /** The deterministic name() rule (mirrored by q91's oracle SQL). */
  def nameFor(addr: String): Option[String] = {
    val last = addr.last
    if (last.isDigit && (last - '0') % 3 == 0) None
    else Some("C" + addr.takeRight(4))
  }

  private val ToRe = """"to"\s*:\s*"([^"]+)"""".r
  private val MethodRe = """"method"\s*:\s*"([^"]+)"""".r
  private val ParamHexRe = """"params"\s*:\s*\[\s*"0x([0-9a-fA-F]+)"""".r
  private val FromBlockRe = """"fromBlock"\s*:\s*"0x([0-9a-fA-F]+)"""".r

  private def ok(result: String) = s"""{"jsonrpc":"2.0","id":1,"result":$result}"""
  private def err(code: Int, msg: String) =
    s"""{"jsonrpc":"2.0","id":1,"error":{"code":$code,"message":"$msg"}}"""

  /** Route one JSON-RPC request body to its rule-based answer. */
  def respond(body: String): String =
    MethodRe.findFirstMatchIn(body).map(_.group(1)) match {
      case Some("eth_blockNumber") => ok(s""""${hexQty(head)}"""")
      case Some("eth_getBlockByNumber") =>
        ParamHexRe.findFirstMatchIn(body).map(m => java.lang.Long.parseLong(m.group(1), 16)) match {
          case Some(n) => blockJson(n).map(ok).getOrElse(ok("null"))
          case None    => err(-32602, "invalid block number")
        }
      case Some("trace_block") =>
        ParamHexRe.findFirstMatchIn(body).map(m => java.lang.Long.parseLong(m.group(1), 16)) match {
          case Some(n) => tracesJson(n).map(ok).getOrElse(ok("null"))
          case None    => err(-32602, "invalid block number")
        }
      case Some("eth_getLogs") =>
        FromBlockRe.findFirstMatchIn(body).map(m => java.lang.Long.parseLong(m.group(1), 16)) match {
          case Some(n) => logsJson(n).map(ok).getOrElse(ok("null"))
          case None    => err(-32602, "invalid filter")
        }
      case Some("eth_call") =>
        ToRe.findFirstMatchIn(body).map(_.group(1)) match {
          case Some(addr) => nameFor(addr) match {
            case Some(n) => ok(s""""${abiEncodeString(n)}"""")
            case None    => err(3, "execution reverted")
          }
          case None => err(-32600, "bad request")
        }
      case _ => err(-32601, "method not found")
    }

  /** Lazily-started singleton on an ephemeral loopback port; daemon
    * executor, lives for the JVM (Temps-style lifecycle). The `/flaky`
    * context corrupts every 5th block's response (truncated JSON) and
    * 500s every 7th — the degraded-node face for resilience specs. */
  lazy val endpoint: String = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def serve(ex: HttpExchange, f: String => (Int, String)): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val (code, resp) = f(body)
      val out = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    }
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        serve(ex, b => (200, respond(b)))
    })
    server.createContext("/flaky", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = serve(ex, { b =>
        ParamHexRe.findFirstMatchIn(b).map(m => java.lang.Long.parseLong(m.group(1), 16)) match {
          case Some(n) if n % 7L == 0L => (500, "internal error")
          case Some(n) if n % 5L == 0L => (200, respond(b).take(40)) // truncated JSON
          case _ => (200, respond(b))
        }
      })
    })
    // every 3rd block 503s on its first two attempts, then recovers —
    // the transient rate-limit face the retry policy must absorb
    // (extract.rs:406-413)
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    server.createContext("/transient", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = serve(ex, { b =>
        ParamHexRe.findFirstMatchIn(b).map(m => java.lang.Long.parseLong(m.group(1), 16)) match {
          case Some(n) if n % 3L == 0L =>
            val k = MethodRe.findFirstMatchIn(b).map(_.group(1)).getOrElse("?") + ":" + n
            val seen = attempts
              .computeIfAbsent(k, _ => new java.util.concurrent.atomic.AtomicInteger(0))
              .incrementAndGet()
            if (seen <= 2) (503, "rate limited") else (200, respond(b))
          case _ => (200, respond(b))
        }
      })
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "graft-rpc-stub"); t.setDaemon(true); t
    })
    // start() spawns the HTTP-Dispatcher thread, which inherits the
    // CALLER's daemon flag — started from a non-daemon thread it would
    // pin the JVM open after main returns
    val started = new java.util.concurrent.CountDownLatch(1)
    val starter = new Thread(() => { server.start(); started.countDown() },
      "graft-rpc-stub-start")
    starter.setDaemon(true)
    starter.start()
    started.await()
    s"http://127.0.0.1:${server.getAddress.getPort}/"
  }

  /** The degraded-node face of the same server. */
  lazy val flakyEndpoint: String = endpoint + "flaky"

  /** The transiently-rate-limited face (recovers after two attempts). */
  lazy val transientEndpoint: String = endpoint + "transient"
}
