package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a table by the interleaved bits of two scan dimensions clusters
  * rows so that a range predicate on EITHER dimension touches a small band
  * of files/row-groups — parquet min/max statistics then prune the rest.
  * At 100 TB this is the difference between "a 2-D selective query reads
  * the whole table" and "it reads a few percent": the layout cost is paid
  * once at write time, every scan benefits.
  *
  * The interleave is a pure bit expression (shift/and/or), so it stays in
  * whole-stage codegen; no UDF.
  */
object ZOrder {

  /** Interleave the low 16 bits of x (even positions) and y (odd positions)
    * into a 32-bit Morton code. Inputs must be pre-quantized to [0, 2^16).
    */
  def interleave16(x: Column, y: Column): Column = {
    val xBits = (0 until 16).map(i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
    val yBits = (0 until 16).map(i =>
      shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    (xBits ++ yBits).reduce(_ bitwiseOR _)
  }

  /** Quantize a bounded double into [0, 2^16) for interleaving. */
  def quantize16(c: Column, lo: Double, hi: Double): Column =
    least(greatest(((c - lo) / (hi - lo) * 65535.0).cast("long"), lit(0L)), lit(65535L))
}
