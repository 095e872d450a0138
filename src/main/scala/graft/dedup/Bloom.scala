package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ShiftRight => CatShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter membership for approximate semi-joins — the 100 TB
  * decontamination shape: instead of shuffling every (train shingle,
  * eval shingle) pair through a semi-join, the eval side is folded
  * into an m-bit filter ONCE (m is sized to the eval benchmark suite,
  * which is fixed and small next to the corpus) and shipped to every
  * task as a plan constant; the corpus-side test is then three md5
  * probes per shingle inside whole-stage codegen — zero shuffle, at
  * the price of a quantified one-sided false-positive rate
  * ((1−e^(−kn/m))^k), which decontamination tolerates: flagging an
  * extra document is safe, missing one is not.
  *
  * The bit positions are plain `md5(r ":" value)` prefixes, so a SQL
  * oracle can mirror the filter EXACTLY as a distinct-position set
  * (bitset membership ≡ set membership on positions — same
  * semantics, different storage), keeping even the false positives
  * hash-verifiable cross-engine.
  *
  * Reference analog: the blacklist/allowed-set membership filters of
  * create_merged.py (should_filter_*), reshaped for a membership set
  * too big to broadcast as rows but fine as bits.
  */
object Bloom {

  /** Fold a position DataFrame (column `pos`, values in [0, m)) into
    * a driver-side bitset. The collect is bounded by m distinct
    * positions — 32 KB of longs per 2^18 bits — NOT by the corpus;
    * callers size m to the small (eval) side by construction. */
  def buildBits(positions: DataFrame, m: Int): Array[Long] = {
    require(m > 0 && m % 64 == 0 && m <= (1 << 26),
      s"Bloom.buildBits: m=$m must be a positive multiple of 64 ≤ 2^26")
    val bits = new Array[Long](m / 64)
    positions.select(col("pos").cast("long")).distinct()
      .collect().foreach { row =>
        val p = row.getLong(0)
        require(p >= 0 && p < m, s"Bloom position $p outside [0, $m)")
        bits((p >> 6).toInt) |= 1L << (p & 63)
      }
    bits
  }

  /** True iff EVERY position column's bit is set in `bits`. The
    * bitset rides into the plan as a foldable array literal (8 B per
    * 64 bits), so the whole test — word lookup, variable shift, mask
    * — stays inside whole-stage codegen. */
  def mightContain(bits: Array[Long], positions: Seq[Column]): Column = {
    require(positions.nonEmpty)
    // ONE literal shared by all k probes: a fresh lit(bits) per probe
    // would put k independent copies of the array in the plan (k × m/8
    // bytes serialized to every task); k references to the same
    // Literal instance serialize the array once
    val bitsLit = lit(bits)
    positions.map { p =>
      val word = element_at(bitsLit, shiftright(p, 6).cast("int") + 1)
      val bit = p.bitwiseAND(lit(63L)).cast("int")
      ColumnBridge.column(CatShiftRight(
        ColumnBridge.expression(word),
        ColumnBridge.expression(bit)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
