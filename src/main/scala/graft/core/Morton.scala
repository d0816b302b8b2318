package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) bit interleaving over Column expressions —
  * shared by the `pipe_zorder_layout` catalog query and the read-side
  * skipping probe ([[graft.core.ZorderSkip]]). Pure codegen'd integer
  * shift/mask ops; no UDF, no shuffle.
  */
object Morton {

  /** Magic-mask bit spread: the low 16 bits of `c` spaced out to even
    * bit positions (4 shift+mask steps). */
  def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(65535L))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(16711935L))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(252645135L))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(858993459L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(1431655765L))
    x
  }

  /** 32-bit Morton code of two 16-bit keys: x's bits on even positions,
    * y's on odd. */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
