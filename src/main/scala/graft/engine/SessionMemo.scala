package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive shared intermediates (tokenized
  * shingle-id tables, fitted ML models, the prepared train/test split):
  * several queries in one Verify/Bench session consume the SAME subtree,
  * and without memoization each of them re-caches and re-computes it.
  *
  * Lifecycle: entries are evicted when their owning session's application
  * ends (a SparkListener is registered on first insert per session), so a
  * stopped session does not pin its cached DataFrames/models forever.
  * Within a session the inputs under a fixture dir are assumed immutable —
  * the driver's one-dir-per-session layout guarantees it; a long-lived
  * multi-corpus service would call [[invalidate]] when a dir is rewritten.
  *
  * Compute runs OUTSIDE the map (get / putIfAbsent, not computeIfAbsent):
  * memoized builders call other memoized builders (model → prepare →
  * shingle ids), and nested `computeIfAbsent` on one ConcurrentHashMap is
  * a documented recursive-update hazard. The cost is a benign duplicate
  * compute under a genuine race; query execution here is sequential.
  */
private[graft] object SessionMemo {
  private val store = new ConcurrentHashMap[(SparkSession, String), AnyRef]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrCompute[T <: AnyRef](spark: SparkSession, key: String)
      (compute: => T): T = {
    if (hooked.add(spark)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictSession(spark)
      })
    }
    val k = (spark, key)
    val existing = store.get(k)
    if (existing != null) existing.asInstanceOf[T]
    else {
      val v = compute
      val prev = store.putIfAbsent(k, v)
      if (prev != null) prev.asInstanceOf[T] else v
    }
  }

  /** Drop one entry (e.g. after rewriting the data under a dir). */
  def invalidate(spark: SparkSession, key: String): Unit =
    store.remove((spark, key))

  def evictSession(spark: SparkSession): Unit = {
    store.keySet.removeIf(_._1 eq spark)
    hooked.remove(spark)
  }
}
