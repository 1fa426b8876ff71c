package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `analyse lifetimes` research questions (SURVEY.md §2.5 A10-A13,
  * §2.4 J5/J6; reference src/analysys/lifetimes.rs). Each RQ is a short
  * aggregation over `deployments ⟗ destructions` — the reference's
  * graph traversal + rayon folds collapse into two groupBys and a full
  * outer join on `contract`.
  */
object Lifetimes {

  /** J5: per-contract deploy/destroy summary — the `ContractLife` row
    * (lifetimes.rs:30-45, 320-357). */
  def contractLives(deployments: DataFrame, destructions: DataFrame): DataFrame = {
    // the two per-contract aggregates + full-outer pairing fused into
    // ONE grouped aggregate over a tagged union (optimization-guide
    // §2.3/§2.4: BHJ is unsupported for full outer, so the pairing
    // sort-merged two corpus-contract-sized frames; the union
    // partial-aggregates map-side into a single exchange with no
    // sorts). Equivalence: per contract, sum(is_dep)/sum(1-is_dep)
    // reproduce the two counts (0 — not null — when a side is absent,
    // exactly what na.fill(0) produced), and min/max over the
    // side-tagged null columns reproduce the outer join's
    // null-when-absent min/max; counts/min/max are order-independent,
    // no floating point anywhere.
    val bnT = deployments.schema("block_number").dataType
    val tsT = deployments.schema("block_datetime").dataType
    val dep = deployments.select(col("contract"), lit(1L).as("is_dep"),
      col("block_number").as("dep_bn"), col("block_datetime").as("dep_ts"),
      lit(null).cast(bnT).as("des_bn"), lit(null).cast(tsT).as("des_ts"))
    val des = destructions.select(col("contract"), lit(0L).as("is_dep"),
      lit(null).cast(bnT).as("dep_bn"), lit(null).cast(tsT).as("dep_ts"),
      col("block_number").as("des_bn"), col("block_datetime").as("des_ts"))
    dep.unionAll(des)
      .groupBy(col("contract"))
      .agg(
        sum(col("is_dep")).as("n_deploys"),
        min(col("dep_bn")).as("first_deploy_block"),
        min(col("dep_ts")).as("first_deploy_ts"),
        sum(lit(1L) - col("is_dep")).as("n_destructions"),
        max(col("des_bn")).as("last_destr_block"),
        max(col("des_ts")).as("last_destr_ts"))
  }

  /** A10 (RQ1): contracts with ≥1 destruction vs all (lifetimes.rs:65-82). */
  def rq1Destroyed(lives: DataFrame): DataFrame =
    lives.agg(
      sum(when(col("n_destructions") > 0, 1L).otherwise(0L)).as("n_destroyed"),
      count(lit(1)).as("n_total"))

  /** A11 (RQ2): of destroyed contracts, destroyed exactly once vs more
    * (lifetimes.rs:84-104). */
  def rq2OnceVsMulti(lives: DataFrame): DataFrame =
    lives.filter(col("n_destructions") > 0).agg(
      sum(when(col("n_destructions") === 1, 1L).otherwise(0L)).as("n_once"),
      sum(when(col("n_destructions") > 1, 1L).otherwise(0L)).as("n_multi"))

  /** A12 (RQ3) via J6: per contract, cross-compare every destruction
    * with every deployment; count pairs sharing a block (different tx)
    * and pairs sharing a tx (lifetimes.rs:106-157). The cross join is
    * intra-contract (bounded fan-out per key), an equi-join on contract. */
  def rq3SameBlockTx(deployments: DataFrame, destructions: DataFrame): DataFrame = {
    val dep = deployments.select(
      col("contract"), col("block_number").as("dep_block"), col("tx_hash").as("dep_tx"))
    val des = destructions.select(
      col("contract"), col("block_number").as("des_block"), col("tx_hash").as("des_tx"))
    dep.join(des, Seq("contract"))
      .select(col("contract"),
        (col("dep_block") === col("des_block") && col("dep_tx") =!= col("des_tx"))
          .as("same_block_diff_tx"),
        (col("dep_tx") === col("des_tx")).as("same_tx"))
      .agg(
        sum(when(col("same_block_diff_tx"), 1L).otherwise(0L)).as("n_same_block_pairs"),
        sum(when(col("same_tx"), 1L).otherwise(0L)).as("n_same_tx_pairs"),
        countDistinct(when(col("same_block_diff_tx"), col("contract")))
          .as("n_contracts_same_block"),
        countDistinct(when(col("same_tx"), col("contract")))
          .as("n_contracts_same_tx"))
  }

  /** A13 (RQ4): lifetime = max(destr block) − min(deploy block), kept
    * when ≥ 0 (lifetimes.rs:227-229); average + POPULATION stddev over
    * blocks, average over seconds (lifetimes.rs:283-287). */
  def rq4LifetimeStats(lives: DataFrame): DataFrame =
    lives
      .filter(col("n_deploys") > 0 && col("n_destructions") > 0)
      .select(
        (col("last_destr_block") - col("first_deploy_block")).as("life_blocks"),
        (unix_timestamp(col("last_destr_ts")) - unix_timestamp(col("first_deploy_ts")))
          .as("life_seconds"))
      .filter(col("life_blocks") >= 0)
      .agg(
        count(lit(1)).as("n_contracts"),
        avg(col("life_blocks")).as("avg_life_blocks"),
        stddev_pop(col("life_blocks")).as("stddev_life_blocks"),
        avg(col("life_seconds")).as("avg_life_seconds"))

  /** K7: the `res.txt` analysis report (lifetimes.rs:65-294, 300) — the
    * four RQ results formatted as prose lines. The aggregates are tiny
    * scalars, so collecting them to the driver is the right plan. */
  def report(deployments: DataFrame, destructions: DataFrame): String = {
    val lives = contractLives(deployments, destructions).cache()
    try {
      val r1 = rq1Destroyed(lives).head()
      val r2 = rq2OnceVsMulti(lives).head()
      val r3 = rq3SameBlockTx(deployments, destructions).head()
      val r4 = rq4LifetimeStats(lives).head()
      Seq(
        s"RQ1: ${r1.getAs[Long]("n_destroyed")} of ${r1.getAs[Long]("n_total")} contracts were destroyed at least once",
        s"RQ2: ${r2.getAs[Long]("n_once")} destroyed exactly once, ${r2.getAs[Long]("n_multi")} more than once",
        s"RQ3: ${r3.getAs[Long]("n_same_block_pairs")} deploy/destroy pairs in the same block (different tx), " +
          s"${r3.getAs[Long]("n_same_tx_pairs")} in the same tx",
        s"RQ4: avg lifetime ${r4.getAs[Double]("avg_life_blocks")} blocks " +
          s"(stddev ${r4.getAs[Double]("stddev_life_blocks")}), " +
          s"${r4.getAs[Double]("avg_life_seconds")} seconds, over ${r4.getAs[Long]("n_contracts")} contracts"
      ).mkString("\n")
    } finally lives.unpersist()
  }
}
