package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Deterministic local JSON-RPC stand-in for the zero-egress sandbox
  * (the same sanction as the stand-in decompiler script in
  * [[graft.queries.ExternalOps]]): a real node is unreachable here, so
  * `name()` eth_calls are answered by rule — addresses whose last
  * digit is divisible by 3 return an RPC error (the unresolvable
  * case), every other address resolves to `"C" + last-4-chars`,
  * ABI-encoded exactly as a Solidity `string` return. The HTTP hop,
  * JSON envelope, ABI decode, and failure path in [[Rpc]] are all
  * real; only the node behind the socket is synthetic.
  */
object RpcStub {

  /** ABI-encode a string return: offset word + length word + padded data. */
  def abiEncodeString(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val data = graft.functions.Hex.encode(bytes)
    val padded = data + "0" * ((64 - data.length % 64) % 64)
    "0x" + f"${32}%064x" + f"${bytes.length}%064x" + padded
  }

  /** The deterministic rule (mirrored by q91's oracle SQL). */
  def nameFor(addr: String): Option[String] = {
    val last = addr.last
    if (last.isDigit && (last - '0') % 3 == 0) None
    else Some("C" + addr.takeRight(4))
  }

  private val ToRe = """"to"\s*:\s*"([^"]+)"""".r

  /** Lazily-started singleton on an ephemeral loopback port; daemon
    * executor, lives for the JVM (Temps-style lifecycle). */
  lazy val endpoint: String = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val resp = ToRe.findFirstMatchIn(body).map(_.group(1)) match {
          case Some(addr) => nameFor(addr) match {
            case Some(n) =>
              s"""{"jsonrpc":"2.0","id":1,"result":"${abiEncodeString(n)}"}"""
            case None =>
              """{"jsonrpc":"2.0","id":1,"error":{"code":3,"message":"execution reverted"}}"""
          }
          case None =>
            """{"jsonrpc":"2.0","id":1,"error":{"code":-32600,"message":"bad request"}}"""
        }
        val out = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      }
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
}
