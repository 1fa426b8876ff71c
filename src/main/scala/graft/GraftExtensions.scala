package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, HexToDecExpr, KeccakExpr, MinHashSigExpr, SkeletonHashExpr, TokenHashExpr, Uint256Sum}

/** The engine's SQL function surface: every native expression callable
  * from plain SQL / `spark.sql(...)`, so SQL-API users get the full
  * scalar layer (SURVEY §2.8) without the Column API:
  *
  *   SELECT graft_keccak256(unhex('c5d2...')),
  *          graft_skeleton_hash(bytecode),
  *          graft_hex_to_dec(value_hex),
  *          graft_token_hash(tok),
  *          graft_minhash_sig(tokens),
  *          graft_dot(a, b)
  *
  * Two registration paths, same table: builder-time
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`), and
  * [[GraftFunctions.register]] for a session that already exists.
  * Expressions only — no custom LogicalPlan/Strategy is injected
  * because no reference semantics require one (SURVEY §4). */
object GraftFunctions {

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_keccak256", "keccak-256 of BINARY -> BINARY",
      es => KeccakExpr(es.head)),
    ("graft_skeleton_hash", "hex bytecode STRING -> 0x keccak of its normalized skeleton",
      es => SkeletonHashExpr(es.head)),
    ("graft_hex_to_dec", "uint256 hex STRING -> decimal STRING",
      es => HexToDecExpr(es.head)),
    ("graft_token_hash", "STRING -> char-fold hash BIGINT",
      es => TokenHashExpr(es.head)),
    ("graft_minhash_sig", "ARRAY<STRING> tokens -> ARRAY<BIGINT>(4) MinHash signature",
      es => MinHashSigExpr(es.head)),
    ("graft_dot", "(ARRAY<DOUBLE>, ARRAY<DOUBLE>) -> DOUBLE dot product",
      es => DotProductExpr(es(0), es(1))),
    ("graft_uint256_sum", "exact aggregate sum of uint256 decimal/0x-hex STRINGs -> decimal STRING",
      es => Uint256Sum(es.head)))

  /** Register on a live session (temp-function scope). */
  def register(spark: SparkSession): Unit = all.foreach { case (name, _, build) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, build, "built-in")
  }

  private[graft] def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")
}

/** Builder-time injection (`spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, build) =>
      ext.injectFunction(
        (FunctionIdentifier(name), GraftFunctions.info(name, usage), build))
    }
}
