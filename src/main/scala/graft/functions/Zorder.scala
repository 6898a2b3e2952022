package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key for multi-dimensional data clustering.
  *
  * Sorting/range-partitioning a table by the interleaved key before
  * writing makes EVERY interleaved dimension locally clustered per
  * file, so parquet row-group min/max statistics prune scans filtered
  * on any combination of the dimensions — the data-skipping layout a
  * 100 TB table needs when queries slice on more than one column
  * (single-column sort only prunes its own column). Pure bit-twiddling
  * column expressions: stays inside WholeStageCodegen, usable in any
  * write pipeline via `repartitionByRange(n, zkey).sortWithinPartitions`.
  */
object Zorder {

  /** Spread the low 16 bits of `c` so they occupy even bit positions
    * (the classic Morton spread via parallel-prefix shifts). */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("bigint").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving the low 16 bits of two non-negative
    * dimension columns (caller normalizes wider domains into 16 bits —
    * rank or bucket first; raw truncation of >16-bit values would
    * de-cluster the curve). */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
