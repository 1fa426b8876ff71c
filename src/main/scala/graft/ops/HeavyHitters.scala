package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CmsExprs

/** CMS-gated exact heavy-hitter thresholding (see
  * [[graft.functions.CmsExprs]] for the no-false-negatives argument):
  *
  *   item rows ──estimate(cms) ≥ T──► admitted rows ──exact groupBy──► counts ≥ T
  *                     │ (no)
  *                     └────────────► provably count < T, never shuffled
  *
  * The output equals `GROUP BY item HAVING count(*) ≥ T` bit for bit;
  * the admitted-row filter is a per-row probe of the broadcast sketch
  * (one treeAggregate to build — no shuffle of the item rows), so the
  * only shuffle whose width follows the VOCABULARY is bounded to the
  * admitted items (true heavies + CMS overestimates at the margin,
  * tuned by eps). */
object HeavyHitters {

  /** Exact (item, cnt) rows with cnt ≥ threshold over `itemCol`
    * (BIGINT), gated by a seeded CMS. */
  def atLeast(items: DataFrame, itemCol: String, threshold: Long,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val cms = items.stat.countMinSketch(itemCol, eps, confidence, seed)
    items
      .where(CmsExprs.estimate(cms)(col(itemCol)) >= threshold)
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
  }
}
