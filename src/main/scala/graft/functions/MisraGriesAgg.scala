package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: the tracked (item → counter) map. At most `counters` entries
  * at any moment — the whole point: the partial each task ships is
  * O(counters), never O(distinct items). */
case class MgBuf(var items: Map[String, Long])

/** Misra–Gries frequent-items summary as a typed `Aggregator` — the
  * deterministic-ORDER-FREE member of the sketch family (CMS/HLL/bloom
  * are hash-deterministic; MG's state depends on arrival and merge
  * order, which Spark does not fix). The summary is therefore surfaced
  * ONLY through its order-invariant guarantees (Misra & Gries 1982;
  * merge rule and additive error from Agarwal et al., "Mergeable
  * Summaries", PODS 2012):
  *
  *   - estimates never exceed the true count (only observed arrivals
  *     increment; decrements only subtract),
  *   - true − est ≤ n/(counters+1) for every item (each decrement step
  *     removes ≥ counters+1 total count, so decrements ≤ n/(counters+1);
  *     merge subtracts the (counters+1)-th largest, preserving the bound
  *     additively across any merge tree),
  *   - hence every item with true count > n/(counters+1) is PRESENT in
  *     the final summary (its estimate is > 0).
  *
  * `reduce` is the classic streaming step (hit: +1; room: insert; full:
  * decrement-all, the arriving item's +1 cancelling its own decrement);
  * `merge` is the mergeable-summaries rule (add counts, subtract the
  * (counters+1)-th largest, keep the strictly-positive survivors).
  * Compiles to ObjectHashAggregate with map-side partials — each
  * partition ships one ≤`counters`-entry map, so a 100 TB stream costs
  * one bounded-width shuffle row per task per group.
  */
class MisraGriesAgg(counters: Int)
    extends Aggregator[String, MgBuf, Map[String, Long]] {

  override def zero: MgBuf = MgBuf(Map.empty)

  override def reduce(b: MgBuf, a: String): MgBuf = {
    if (a == null) return b
    val m = b.items
    b.items =
      if (m.contains(a)) m.updated(a, m(a) + 1L)
      else if (m.size < counters) m.updated(a, 1L)
      else m.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }
    b
  }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    if (y.items.isEmpty) return x
    if (x.items.isEmpty) return y
    var m = x.items
    y.items.foreach { case (k, v) => m = m.updated(k, m.getOrElse(k, 0L) + v) }
    if (m.size > counters) {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(counters)
      m = m.flatMap { case (k, v) => if (v > cut) Some(k -> (v - cut)) else None }
    }
    x.items = m
    x
  }

  override def finish(b: MgBuf): Map[String, Long] = b.items

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
