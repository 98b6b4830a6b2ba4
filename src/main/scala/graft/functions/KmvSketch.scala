package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002) as a TRUE
  * PARTIAL AGGREGATE: per-group state is the k smallest DISTINCT hash
  * values seen, combined map-side and shipped as ≤ k longs per group
  * across the shuffle — the bounded-memory answer to per-group
  * `count(distinct x)`, whose exact form must exchange every distinct
  * value of every group. The estimator reads the k-th smallest value
  * off the finished buffer: with hashes uniform on [0, M), the distinct
  * count ≈ (k−1)·M / h₍ₖ₎.
  *
  * Unlike the engine-native HLL (`approx_count_distinct`, whose sketch
  * layout is engine-specific and unreplayable), the KMV buffer is a
  * pure ORDER STATISTIC of a portable hash: any engine that can compute
  * the same hash and sort derives the identical buffer, k-th value, and
  * estimate — so the whole sketch is DuckDB-oracle-checkable bit for
  * bit. The merge is the set-union-then-trim of two sorted buffers:
  * associative, commutative, duplicate-safe (KMV is defined on the
  * distinct hash SET, so the same value arriving twice — or in two
  * partials — cannot double-insert).
  *
  * The common-case reduce on a full buffer is one comparison against
  * the current k-th value; the O(k) membership scan and O(k log k)
  * re-sort only run when a value actually lands inside the window.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  def zero: Seq[Long] = Seq.empty

  def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.size >= k && a >= b.last) b // full and past the window: no-op
    else if (b.contains(a)) b // already in the distinct set
    else ((b :+ a).sorted: Seq[Long]).take(k)

  def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    ((x ++ y).distinct.sorted: Seq[Long]).take(k)

  def finish(b: Seq[Long]): Seq[Long] = b

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** Hash-reservoir sketch for ORACLE-CHECKABLE quantiles: per-group
  * state is the k smallest DISTINCT (hash, value) pairs under
  * lexicographic (hash, value) order, where the hash is the portable
  * poly hash of a UNIQUE ROW KEY — so the kept pairs are a
  * deterministic uniform-without-replacement sample of the group's
  * value OCCURRENCES (hashing the row key, not the value, preserves
  * multiplicity: two rows with equal values keep distinct hashes).
  * Like [[KmvSketch]], the buffer is a pure order statistic of a
  * portable hash: any engine derives the identical k pairs, the
  * identical sorted sample values, and therefore the identical
  * nearest-rank quantile ESTIMATES — the property that lets the
  * percentile estimate itself hash-gate against DuckDB, which the
  * engine-native `approx_percentile` sketch cannot.
  *
  * Sampling error is the classic order-statistic bound: the rank of
  * the sample's q-quantile concentrates within O(√(q(1−q)/k)) of q —
  * k = 256 puts the p50 estimate within ~±3 rank-percent with high
  * probability. Merge is set-union-then-trim: associative,
  * commutative, duplicate-safe (a hash collision on equal values is
  * ONE sample slot by definition, identically in every engine).
  * Exactly k (hash, value) pairs per group cross the shuffle.
  */
class HashReservoirSketch(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")
  private val ord = implicitly[Ordering[(Long, Long)]]

  def zero: Seq[(Long, Long)] = Seq.empty

  def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.size >= k && ord.gteq(a, b.last)) b
    else if (b.contains(a)) b
    else ((b :+ a).sorted(ord): Seq[(Long, Long)]).take(k)

  def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ((x ++ y).distinct.sorted(ord): Seq[(Long, Long)]).take(k)

  def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

/** Null-skipping boxed front for the SQL/UDAF surface: SQL columns are
  * nullable, and the natural inputs (`utf8_poly_id` of a possibly-null
  * string) propagate NULL — which must be IGNORED, the way every
  * engine-native aggregate (`approx_count_distinct` included) ignores
  * nulls, not fail at encode time the way a bare `Aggregator[Long, …]`
  * does. The typed Dataset path keeps using [[KmvSketch]] directly
  * (its inputs are non-nullable by construction there).
  */
class KmvSketchSql(k: Int)
    extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  private val inner = new KmvSketch(k)
  def zero: Seq[Long] = inner.zero
  def reduce(b: Seq[Long], a: java.lang.Long): Seq[Long] =
    if (a == null) b else inner.reduce(b, a.longValue)
  def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = inner.merge(x, y)
  def finish(b: Seq[Long]): Seq[Long] = inner.finish(b)
  def bufferEncoder: Encoder[Seq[Long]] = inner.bufferEncoder
  def outputEncoder: Encoder[Seq[Long]] = inner.outputEncoder
}
