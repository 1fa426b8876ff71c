package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** U2/J9: the per-contract `name()` eth_call enrichment
  * (contract_deployment.rs:118-156) as a `mapPartitions` JSON-RPC
  * stage — the same out-of-Catalyst pattern as [[graft.etl.Decompile]]:
  * side-effecting I/O lives behind an explicit per-partition client
  * with connection reuse (one keep-alive HttpClient per partition, NOT
  * one per row), and the result joins back to deployments as a plain
  * lookup table ([[Sanctuary.enrichNames]]).
  *
  * At scale: dedupe to DISTINCT addresses before the RPC fan-out,
  * partition count bounds concurrent connections, and a failed or
  * error-returning call degrades to `resolved=false` instead of
  * failing the task (the reference returns `false` likewise).
  */
object Rpc {

  final case class NameRow(contract: String, name: String, resolved: Boolean)

  /** keccak("name()") selector — the reference's ABI method id. */
  val NameSelector = "0x06fdde03"

  /** JVM-singleton HTTP client (thread-safe; JDK 17 HttpClient has no
    * close(), so per-call instances would leak selector threads). */
  lazy val sharedClient: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  /** Decode an ABI-encoded `string` return value (0x + offset word +
    * length word + UTF-8 data padded to 32 bytes). None on anything
    * malformed. */
  def decodeAbiString(resultHex: String): Option[String] = {
    try {
      val h = if (resultHex.startsWith("0x")) resultHex.substring(2) else resultHex
      if (h.length < 128) return None
      val offset = java.lang.Long.parseLong(h.substring(0, 64), 16).toInt * 2
      val len = java.lang.Long.parseLong(h.substring(offset, offset + 64), 16).toInt * 2
      val data = h.substring(offset + 64, offset + 64 + len)
      Some(new String(graft.functions.Hex.decode(data), java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Exception => None }
  }

  private val ResultRe = """"result"\s*:\s*"(0x[0-9a-fA-F]*)"""".r

  /** Resolve `name()` for every DISTINCT contract address in
    * `deployments` against a JSON-RPC endpoint. Returns
    * (contract, name, resolved). */
  def resolveNames(deployments: DataFrame, endpoint: String,
      timeoutMs: Long = 10000L): DataFrame = {
    val spark = deployments.sparkSession
    import spark.implicits._
    deployments.select(col("contract")).dropDuplicates("contract")
      .as[String]
      .mapPartitions { rows =>
        // one client per JVM (HttpClient is thread-safe and has no
        // close() on JDK 17 — per-partition instances would leak their
        // selector threads): HTTP/1.1 keep-alive reuses sockets across
        // all of the executor's calls. Per-request timeouts so one
        // hung node degrades that call to resolved=false instead of
        // stalling the task forever.
        val client = Rpc.sharedClient
        val uri = URI.create(endpoint)
        rows.map { addr =>
          val payload =
            s"""{"jsonrpc":"2.0","id":1,"method":"eth_call","params":[{"to":"$addr","data":"$NameSelector"},"latest"]}"""
          try {
            val req = HttpRequest.newBuilder(uri)
              .header("Content-Type", "application/json")
              .timeout(java.time.Duration.ofMillis(timeoutMs))
              .POST(HttpRequest.BodyPublishers.ofString(payload))
              .build()
            val body = client.send(req, HttpResponse.BodyHandlers.ofString()).body()
            ResultRe.findFirstMatchIn(body)
              .flatMap(m => decodeAbiString(m.group(1))) match {
              case Some(n) => NameRow(addr, n, resolved = true)
              case None    => NameRow(addr, null, resolved = false)
            }
          } catch { case _: Exception => NameRow(addr, null, resolved = false) }
        }
      }
      .toDF()
  }
}
