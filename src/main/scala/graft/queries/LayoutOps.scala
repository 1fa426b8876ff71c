package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.ZOrder
import Tables._

/** Data-layout clustering queries — the write-side twin of the scan
  * optimizations: how rows are ORDERED into files decides how many
  * files a multi-column predicate must touch (see [[graft.ops.ZOrder]]
  * for the production shape: zkey projection → repartitionByRange →
  * sorted write → parquet min/max stats prune the rest).
  *
  * The registered query is self-measuring AND two-sided: it lays the
  * SAME rows into the SAME number of equal files under a z-order key
  * and under a linear (x-major) key, then probes both with (a) an
  * (x, y) rectangle — where x-major already prunes on x — and (b) a
  * y-only band — the case x-major cannot prune at all and z-order
  * still can. The touched-file footprints ARE the result; the
  * rows_matching_* columns are layout-invariant (in-band self-check).
  * The oracle replays both layouts row-for-row (ntile over identical
  * total orders; duplicate sort keys carry identical (x, y), so file
  * stats and counts are placement-independent). */
object LayoutOps {

  private val Bits = 8 // x, y ∈ 0..255 key space
  private val Files = 64
  // probes sized to be non-empty at every driver SF (sf0.001 has
  // l_partkey ≤ 199, l_suppkey ≤ 9): a 32×32 tile near the origin and
  // a y-only band of the 8 lowest y values
  private val (loX, hiX, loY, hiY) = (32, 63, 0, 31)
  private val (bandLoY, bandHiY) = (0, 7)

  private def rectTouch: Column =
    col("mnx") <= hiX && col("mxx") >= loX &&
      col("mny") <= hiY && col("mxy") >= loY
  private def bandTouch: Column =
    col("mny") <= bandHiY && col("mxy") >= bandLoY

  /** One layout's stats row: file the ordered rows into `Files` equal
    * buckets, keep per-file (x, y) min/max, report both probes'
    * footprints. The 1-row aggregate cross-join is a bounded
    * broadcast (PlanSpec's sanctioned stats-frame shape). */
  private def layoutRow(base: DataFrame, order: Seq[Column], name: String): DataFrame = {
    val filed = base
      .withColumn("f", ntile(Files).over(Window.orderBy(order: _*)))
    val files = filed.groupBy(col("f"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("mnx"), max(col("x")).as("mxx"),
        min(col("y")).as("mny"), max(col("y")).as("mxy"))
      .agg(count(lit(1)).as("files_total"),
        sum(when(rectTouch, 1L).otherwise(0L)).as("rect_files_touched"),
        sum(when(rectTouch, col("n")).otherwise(0L)).as("rect_rows_in_touched"),
        sum(when(bandTouch, 1L).otherwise(0L)).as("band_files_touched"),
        sum(when(bandTouch, col("n")).otherwise(0L)).as("band_rows_in_touched"))
    val matching = base.agg(
      sum(when(col("x").between(loX, hiX) && col("y").between(loY, hiY), 1L)
        .otherwise(0L)).as("rows_matching_rect"),
      sum(when(col("y").between(bandLoY, bandHiY), 1L)
        .otherwise(0L)).as("rows_matching_band"))
    files.crossJoin(matching).select(lit(name).as("layout"),
      col("files_total"), col("rect_files_touched"), col("rect_rows_in_touched"),
      col("band_files_touched"), col("band_rows_in_touched"),
      col("rows_matching_rect"), col("rows_matching_band"))
  }

  def defs: Map[String, Q] = Map(
    // z-order vs linear layout, quantified on both probe shapes: the
    // rectangle (x-major competitive) and the y-band (x-major touches
    // EVERY file, z-order keeps a bounded footprint).
    "q163_zorder_layout" -> Q(
      (s, d) => {
        val base = lineitem(s, d).select(
            col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
            (col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
          .withColumn("zkey", ZOrder.interleave(col("x"), col("y"), Bits))
          .localCheckpoint() // read 4 ways (2 layouts × files+matching)
        layoutRow(base, Seq(col("zkey"), col("ok"), col("ln")), "zorder")
          .unionByName(
            layoutRow(base, Seq(col("x"), col("y"), col("ok"), col("ln")), "linear"))
      },
      Some {
        val z = ZOrder.interleaveSql("x", "y", Bits)
        def one(name: String, ord: String) =
          s"""(SELECT '$name' AS layout,
             |   CAST(ft.files_total AS BIGINT) AS files_total,
             |   CAST(ft.rect_files_touched AS BIGINT) AS rect_files_touched,
             |   CAST(ft.rect_rows_in_touched AS BIGINT) AS rect_rows_in_touched,
             |   CAST(ft.band_files_touched AS BIGINT) AS band_files_touched,
             |   CAST(ft.band_rows_in_touched AS BIGINT) AS band_rows_in_touched,
             |   CAST(m.rows_matching_rect AS BIGINT) AS rows_matching_rect,
             |   CAST(m.rows_matching_band AS BIGINT) AS rows_matching_band
             | FROM (
             |   SELECT count(*) AS files_total,
             |     sum(CASE WHEN mnx <= $hiX AND mxx >= $loX
             |              AND mny <= $hiY AND mxy >= $loY THEN 1 ELSE 0 END) AS rect_files_touched,
             |     sum(CASE WHEN mnx <= $hiX AND mxx >= $loX
             |              AND mny <= $hiY AND mxy >= $loY THEN n ELSE 0 END) AS rect_rows_in_touched,
             |     sum(CASE WHEN mny <= $bandHiY AND mxy >= $bandLoY THEN 1 ELSE 0 END) AS band_files_touched,
             |     sum(CASE WHEN mny <= $bandHiY AND mxy >= $bandLoY THEN n ELSE 0 END) AS band_rows_in_touched
             |   FROM (
             |     SELECT f, count(*) AS n, min(x) AS mnx, max(x) AS mxx,
             |            min(y) AS mny, max(y) AS mxy
             |     FROM (SELECT x, y, ntile($Files) OVER (ORDER BY $ord) AS f FROM b)
             |     GROUP BY f)) ft
             | CROSS JOIN (
             |   SELECT sum(CASE WHEN x BETWEEN $loX AND $hiX
             |              AND y BETWEEN $loY AND $hiY THEN 1 ELSE 0 END) AS rows_matching_rect,
             |          sum(CASE WHEN y BETWEEN $bandLoY AND $bandHiY THEN 1 ELSE 0 END) AS rows_matching_band
             |   FROM b) m)""".stripMargin
        s"""WITH b AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
           |             l_partkey % 256 AS x, l_suppkey % 256 AS y,
           |             $z AS zkey
           |           FROM lineitem)
           |${one("zorder", "zkey, ok, ln")}
           |UNION ALL
           |${one("linear", "x, y, ok, ln")}""".stripMargin
      },
      "z-order vs linear file layout: rectangle and y-band probes' touched-file footprints, same data and file count"))
}
