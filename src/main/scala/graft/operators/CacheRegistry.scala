package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded cache bookkeeping for operators that persist an intermediate
  * (two-pass samplers, LSH bucket projections). Spark's CacheManager never
  * releases a persisted plan on its own, so repeated operator calls would
  * each pin a dead copy of their input. Swapping through this registry
  * unpersists the PREVIOUS cache under the same key — the steady-state
  * footprint is at most one cached dataset per operator, regardless of how
  * many times a driver session invokes it. */
private[operators] object CacheRegistry {
  private val last = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def swap(key: String, df: DataFrame): DataFrame = {
    val prev = last.put(key, df)
    if (prev != null && (prev ne df)) {
      try prev.unpersist(blocking = false)
      catch { case _: Exception => () }
    }
    df
  }
}
