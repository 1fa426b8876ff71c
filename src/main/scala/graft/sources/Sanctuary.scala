package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The "smart-contract-sanctuary" verified-source lookup (SURVEY.md §2.1
  * S5, §2.4 J10, §2.8 F14; reference contract_deployment.rs:158-193).
  *
  * The reference globs `contracts/mainnet/<first-2-hex>/<address>_<name>.sol`
  * per deployment — a filesystem round-trip per contract. Spark-first:
  * index the WHOLE tree once with `input_file_name()`, parse the address
  * out of each path, and verification becomes one broadcast-able
  * left join keyed on lowercase address. The 2-hex shard directory
  * (F14's glob prefix) is the tree's own partitioning — Spark's file
  * listing parallelizes over it.
  */
object Sanctuary {

  /** Index a sanctuary tree → (address, source_name, source_path).
    * Address = filename prefix before '_', lowercased, 0x-prefixed. */
  def index(spark: SparkSession, root: String): DataFrame =
    parseNames(
      spark.read
        .option("recursiveFileLookup", "true")
        .option("wholetext", "true")
        .text(s"$root")
        .select(input_file_name().as("path"), col("value").as("source_code"))
        .withColumn("file", element_at(split(col("path"), "/"), -1)))
      .select("address", "source_name", "source_code", "path")

  /** Parse (address, source_name) out of a (path, file) frame — shared
    * by the content index and the listing-only index. */
  private def parseNames(df: DataFrame): DataFrame =
    df.withColumn("address",
        lower(concat(lit("0x"),
          regexp_extract(col("file"), "^(?:0x)?([0-9a-fA-F]{40})", 1))))
      .filter(length(col("address")) === 42)
      .withColumn("source_name",
        regexp_extract(col("file"), "^[^_]*_(.*)\\.sol$", 1))

  /** Metadata-ONLY index: (address, source_name, path) from the file
    * LISTING — no file body is ever opened, so `verify(withSource =
    * false)` over a huge tree costs directory metadata ops, not content
    * IO. The driver walks only DIRECTORIES (the 2-hex shard fanout,
    * O(dirs) dirents); per-directory FILE listing is distributed across
    * executors. */
  def indexListing(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = scala.collection.mutable.ArrayBuffer(rootPath.toString)
    val stack = scala.collection.mutable.Stack(rootPath)
    while (stack.nonEmpty) {
      fs.listStatus(stack.pop()).foreach { st =>
        if (st.isDirectory) { stack.push(st.getPath); dirs += st.getPath.toString }
      }
    }
    // ship the session's Hadoop conf (credentials, fs impls) to the
    // executor-side listings as a serializable property list
    val confProps: Seq[(String, String)] = {
      val c = spark.sessionState.newHadoopConf()
      val it = c.iterator(); val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toSeq
    }
    val listed = spark.createDataset(dirs.toSeq)
      .repartition(math.min(dirs.size, 64))
      .mapPartitions { ps =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confProps.foreach { case (k, v) => conf.set(k, v) }
        ps.flatMap { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).listStatus(p).iterator
            .filter(_.isFile)
            .map(st => (st.getPath.toString, st.getPath.getName))
        }
      }
      .toDF("path", "file")
    parseNames(listed).select("address", "source_name", "path")
  }

  /** J10: flag deployments with verified source (left join against the
    * index; the index is small relative to deployments → broadcast).
    * With `withSource = false` the index frame need not carry a
    * `source_code` column at all — pair with [[indexListing]] so
    * verification never reads file bodies. */
  def verify(deployments: DataFrame, sanctuaryIndex: DataFrame,
      withSource: Boolean = false): DataFrame = {
    val cols = Seq(col("address").as("contract"), col("source_name")) ++
      (if (withSource) Seq(col("source_code")) else Nil)
    val idx = sanctuaryIndex.select(cols: _*).dropDuplicates("contract")
    deployments
      .join(broadcast(idx.withColumn("verified_source", lit(true))),
        Seq("contract"), "left")
      .withColumn("verified_source", coalesce(col("verified_source"), lit(false)))
  }

  /** J9: name enrichment — left join against a pre-fetched
    * (address, name) table (the reference's per-contract `name()`
    * eth_call, contract_deployment.rs:118-156, becomes a lookup-table
    * join; live mode would build that table with a mapPartitions RPC
    * stage, same shape as [[graft.etl.Decompile]]). */
  def enrichNames(deployments: DataFrame, names: DataFrame): DataFrame =
    deployments.join(
      broadcast(names.select(col("address").as("contract"), col("name"))
        .dropDuplicates("contract")),
      Seq("contract"), "left")
}
