package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: element-wise running sums + count. `sums` is empty until the
  * first input fixes the dimensionality. */
case class CentroidBuf(var sums: Array[Double], var n: Long)

/** Element-wise mean of fixed-dimension vectors — the typed
  * `Aggregator[IN, BUF, OUT]` / `udaf()` surface demonstration
  * (SURVEY.md §2.8). Mutates its buffer in `reduce`/`merge` (the
  * Aggregator contract allows it), so per-row cost is one array sweep —
  * the map-side partial aggregation this compiles to
  * (ObjectHashAggregate) is what makes it viable on 100 TB of vectors:
  * each partition reduces to one 64-double buffer before the shuffle.
  */
object CentroidAgg extends Aggregator[Array[Double], CentroidBuf, Array[Double]] {
  override def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: CentroidBuf, a: Array[Double]): CentroidBuf = {
    if (a == null) return b
    if (b.sums.length == 0) b.sums = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { b.sums(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    if (y.sums.length == 0) return x
    if (x.sums.length == 0) return y
    var i = 0
    while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0) Array.emptyDoubleArray else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
