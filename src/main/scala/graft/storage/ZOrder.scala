package graft.storage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering keys for multi-dimension
 * data-skipping — the lakehouse layout technique (Delta/Iceberg
 * `ZORDER BY` / `sort_order`) for tables queried by MORE THAN ONE
 * column. Sorting the image table by `phash` alone makes phash range
 * scans cheap but leaves `w`-predicates reading every file; sorting by
 * the bit-interleaved key keeps every file's min/max envelope tight on
 * BOTH dimensions, so parquet footer stats prune files for either
 * predicate (ZOrderSpec quantifies the envelope shrink).
 *
 * Pure column bit arithmetic (shifts/masks — whole-stage codegen, no
 * UDF), deterministic and engine-portable: the DuckDB oracle replays
 * the identical mask chain. At 100 TB the clustering cost is the one
 * sort at write time — the same `repartitionByRange(zkey).sortWithinPartitions`
 * shape any ordered write uses; reads pay nothing.
 */
object ZOrder {

  /** Spread the low 31 bits of `x` to the even bit positions of a
    * 64-bit value (the classic magic-number dilation). 31 bits, not
    * 32: bit 31 of the second dimension would land on the long's SIGN
    * bit, and a signed sort of the key would then order the top half
    * of the domain before the bottom half — exactly the locality break
    * the key exists to prevent. */
  def spread31(x: Column): Column = {
    val masks = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8  -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL,
      2  -> 0x3333333333333333L,
      1  -> 0x5555555555555555L)
    masks.foldLeft(x.bitwiseAND(lit(0x7FFFFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }
  }

  /** 62-bit Morton key interleaving the low 31 bits of two non-negative
    * dimension columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. The key is always non-negative, so signed ordering IS
    * curve ordering. Range-close points in (a, b) are key-close, which
    * is what tightens per-file min/max envelopes after a sort by the
    * key. Wider dims (a 64-bit phash) shift down or split into two
    * keys first. */
  def zkey(a: Column, b: Column): Column =
    spread31(a).bitwiseOR(shiftleft(spread31(b), 1))
}
