package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a TRUE PARTIAL AGGREGATE — the scale
  * answer to window-ranked top-k. `row_number()` must hash-exchange and
  * SORT every row of every group before it can discard rank > k: at
  * 100 TB that is a full shuffle and sort of the fact table to keep a
  * handful of rows per key. This Aggregator instead keeps a k-slot
  * sorted buffer per group, combines map-side, and ships only ≤ k
  * entries per group across the shuffle — per-group state O(k), network
  * O(groups·k), and no Sort operator anywhere in the plan (gated in
  * PlanSpec). The same asymmetry as TakeOrderedAndProject, applied
  * per-group.
  *
  * Entries are (score, tiebreak-key) pairs ordered score-desc then
  * key-asc; the unique key makes the cut at rank k deterministic across
  * engines and reruns (SURVEY §7.5 risk 6). The common-case reduce is a
  * single comparison against the current k-th entry — the O(k log k)
  * re-sort only runs when a row actually displaces one.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by(e => (-e._1, e._2))

  // buffers are kept sorted by construction; trim preserves that
  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted(ord).take(k)

  def zero: Seq[(Double, Long)] = Seq.empty

  def reduce(b: Seq[(Double, Long)],
      a: (Double, Long)): Seq[(Double, Long)] =
    if (b.size >= k && ord.compare(a, b.last) >= 0) b
    else trim(b :+ a)

  def merge(x: Seq[(Double, Long)],
      y: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(x ++ y)

  def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
