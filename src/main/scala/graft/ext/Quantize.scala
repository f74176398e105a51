package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-vector int8 scalar quantization for embedding columns — the 4×
  * memory/IO compression that makes billion-vector ANN shards fit executor
  * memory (codes ride the shuffle; float vectors stay in storage for the
  * re-rank stage).
  *
  * Scheme: per-vector min/max affine grid, 256 levels:
  * `code_i = clamp(floor((x_i - mn) / scale), 255)`, `scale = (mx-mn)/255`,
  * reconstruction `x̂_i = mn + code_i · scale` — error ≤ one grid step per
  * component. Constant vectors (mx = mn) quantize to all-zero codes with
  * exact reconstruction. Every step is plain double arithmetic in a fixed
  * evaluation order, so an oracle engine evaluating the same expression
  * shape reproduces the codes bit-for-bit (adjudicated by `e2i`).
  */
object Quantize {

  /** Cast a float embedding to the double working space (index order kept). */
  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** Struct column (mn, scale, codes array<long>) quantizing `vec`. */
  def quantizeInt8(vec: Column): Column = {
    val x = asDouble(vec)
    val mn = array_min(x)
    val scale = (array_max(x) - mn) / 255.0
    val codes = when(scale === 0, transform(x, _ => lit(0L)))
      .otherwise(transform(x, y => least(floor((y - mn) / scale), lit(255L))))
    struct(mn.as("mn"), scale.as("scale"), codes.as("codes"))
  }

  /** Reconstructed double vector from a [[quantizeInt8]] struct. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"),
      c => q.getField("mn") + c.cast("double") * q.getField("scale"))

  /** Per-component absolute reconstruction errors vs the original. */
  def reconstructionErrors(vec: Column, q: Column): Column =
    zip_with(asDouble(vec), dequantize(q), (y, r) => abs(y - r))
}
