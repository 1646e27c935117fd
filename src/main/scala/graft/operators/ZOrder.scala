package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — ONE definition of the bit-interleave
  * recipe shared by q45_zorder (file-locality demo) and op_zorder_manifest
  * (manifest-level 2-D skipping), so the two ops can never drift apart.
  *
  * Each dimension is scaled to a 16-bit rank over its [min, max] range and
  * the ranks' bits are interleaved (dimension i owns bit n·k+i of the
  * z value), giving every range-partitioned file a tight bounding box in
  * EVERY dimension at once. */
object ZOrder {

  /** 16-bit min/max scaling of an integral column. */
  def scaled(c: Column, lo: Long, hi: Long): Column =
    (c.cast("long") - lo) * 65535L / math.max(1L, hi - lo)

  /** The interleaved z value for `dims` = (column, min, max) per
    * dimension. Layout-internal only — never emitted in results, so no
    * cross-engine arithmetic contract applies. */
  def zValue(dims: Seq[(Column, Long, Long)]): Column = {
    val n = dims.size
    (0 until 16).flatMap { k =>
      dims.zipWithIndex.map { case ((c, lo, hi), i) =>
        shiftright(scaled(c, lo, hi), k).bitwiseAND(lit(1L)) *
          lit(1L << (n * k + i))
      }
    }.reduce(_ + _)
  }
}
