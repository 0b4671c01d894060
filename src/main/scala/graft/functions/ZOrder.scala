package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve value for two dimension keys — the layout
  * primitive behind multi-dimensional data skipping: sort/range-partition
  * a table by `zvalue(a, b)` before writing and BOTH `a`-predicates and
  * `b`-predicates prune files on their parquet min/max stats, where a
  * plain sort clusters only its leading column (see ZOrderSpec for the
  * measured range-width comparison, and q59_zorder for the oracle).
  *
  * Built as a pure column composition (shifts/and/or are codegen'd
  * built-ins — no custom Expression needed, SURVEY §7.3 preference (a)),
  * from the textbook bit-interleave: bit i of `a` lands at z-bit 2i+1,
  * bit i of `b` at z-bit 2i. Keys are folded to 16 bits first, so the
  * z-value fits a positive long. The SAME 32-term formula is emitted as
  * SQL for the DuckDB oracle — bit math is exact in every engine.
  */
object ZOrder {

  val Bits = 16

  /** fold a non-negative key into [0, 2^16) — at real scale the inputs
    * would be range-bucketed percentiles; modulo keeps the oracle exact */
  private def fold(c: Column): Column = pmod(c, lit(1 << Bits))

  /** z = interleave(bits of a, bits of b), a in odd positions */
  def zvalue(a: Column, b: Column): Column = {
    val fa = fold(a)
    val fb = fold(b)
    (0 until Bits).map { i =>
      shiftleft(shiftright(fa, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(fb, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** identical formula as engine-neutral SQL (DuckDB oracle side).
    * DuckDB's % takes the sign of the dividend while Spark's pmod is
    * always non-negative — the double-mod keeps the two formulas
    * identical for negative keys too, not just the documented
    * non-negative range. */
  def zvalueSql(a: String, b: String): String = {
    val m = 1 << Bits
    val fa = s"(((($a) % $m) + $m) % $m)"
    val fb = s"(((($b) % $m) + $m) % $m)"
    (0 until Bits).map { i =>
      s"((($fa >> $i) & 1) << ${2 * i + 1}) | ((($fb >> $i) & 1) << ${2 * i})"
    }.mkString("(", ") | (", ")")
  }
}
