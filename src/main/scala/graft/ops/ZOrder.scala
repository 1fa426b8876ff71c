package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-column DATA-LAYOUT
  * clustering key that makes min/max file skipping work for more than
  * one predicate column at once. A table laid out by `x` alone prunes
  * `x` ranges perfectly and `y` ranges not at all; laying it out by
  * the bit-interleave of (x, y) gives every file a small rectangle of
  * (x, y) space, so a rectangle probe touches only the files whose
  * stats intersect it (Delta/Iceberg's OPTIMIZE ZORDER; Morton 1966).
  *
  * 100-TB shape: compute `zkey` as a zero-shuffle projection, then
  * `repartitionByRange($"zkey")` + `sortWithinPartitions` and write —
  * one range shuffle, after which every parquet file's (x, y) min/max
  * footprint is a compact tile and the scan planner's stats pruning
  * does the rest. The registered query ([[graft.queries.LayoutOps]])
  * quantifies exactly that: files touched by a rectangle probe under
  * a z-order layout vs a linear one, same data, same file count. */
object ZOrder {

  /** Interleave the low `bits` bits of x and y (x gets the even bit
    * positions, y the odd): zkey = Σ_j ((x>>j)&1)<<2j + ((y>>j)&1)<<(2j+1).
    * Pure integer arithmetic on disjoint bit positions (the sum IS the
    * bitwise OR), replayable verbatim in ANSI SQL. */
  def interleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)

  /** The same interleave as ANSI SQL over BIGINT exprs `x`, `y`. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { j =>
      s"((($x >> $j) & 1) << ${2 * j}) + ((($y >> $j) & 1) << ${2 * j + 1})"
    }.mkString(" + ")
}
