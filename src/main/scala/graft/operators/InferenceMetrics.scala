package graft.operators

/** Inference telemetry — MetricsKeeper + QueueSizesKeeper
  * (inference/metrics.py:1-131). The reference logs these per rank while
  * the inference loop runs; here [[InferenceRunner]] keeps one per
  * partition and logs the table at each chunk commit. The clock is
  * injectable so the sliding-window eviction arithmetic is testable
  * deterministically (and because Date.now in task code would make
  * retried tasks non-reproducible anyway).
  *
  * @param windowMs recent-rate window; reference default 5 minutes
  * @param clock    milliseconds-now supplier (System.currentTimeMillis in
  *                 production)
  */
final class MetricsKeeper(windowMs: Long = 5 * 60 * 1000L,
                          clock: () => Long = () => System.currentTimeMillis())
  extends Serializable {

  private var startMs = clock()
  private val total = scala.collection.mutable.LinkedHashMap.empty[String, Long]
  private val window = scala.collection.mutable.ArrayDeque.empty[(Long, Map[String, Long])]
  private val windowSum = scala.collection.mutable.HashMap.empty[String, Long]

  def reset(): Unit = {
    total.clear(); window.clear(); windowSum.clear(); startMs = clock()
  }

  /** add_metrics (metrics.py:29-54): bump cumulative + windowed sums and
    * evict entries older than the window. The `<= 0` cleanup mirrors the
    * reference (a zeroed key drops out of the recent table entirely). */
  def addMetrics(kv: (String, Long)*): Unit = {
    val now = clock()
    for ((k, v) <- kv) total(k) = total.getOrElse(k, 0L) + v
    window.append((now, kv.toMap))
    for ((k, v) <- kv) windowSum(k) = windowSum.getOrElse(k, 0L) + v
    while (window.nonEmpty && window.head._1 < now - windowMs) {
      val (_, old) = window.removeHead()
      for ((k, v) <- old) {
        val left = windowSum.getOrElse(k, 0L) - v
        if (left <= 0) windowSum.remove(k) else windowSum(k) = left
      }
    }
  }

  /** (lifetime rate, recent rate) per metric in /sec — the two columns of
    * the reference's table (metrics.py:56-82). */
  def rates(): Map[String, (Double, Double)] = {
    val now = clock()
    val elapsedSec = (now - startMs) / 1000.0
    val windowSec =
      if (elapsedSec > 0) math.min(windowMs / 1000.0, elapsedSec) else 1.0
    total.map { case (k, tot) =>
      val w = windowSum.getOrElse(k, 0L)
      val totalRate = if (elapsedSec > 0) tot / elapsedSec else 0.0
      val windowRate = if (windowSec > 0) w / windowSec else 0.0
      k -> (totalRate, windowRate)
    }.toMap
  }

  /** The reference's formatted table: metric, lifetime /sec, recent /sec,
    * keys sorted for stable output. */
  override def toString: String = {
    val header = f"${"Metric Name"}%-30s ${"Lifetime (/sec)"}%20s ${"Recently (/sec)"}%20s"
    val r = rates()
    (Seq(header, "-" * header.length) ++
      r.keys.toSeq.sorted.map { k =>
        val (t, w) = r(k)
        f"$k%-30s $t%20.2f $w%20.2f"
      }).mkString("\n")
  }
}

/** QueueSizesKeeper (metrics.py:85-131): gauge-style queue depths, floored
  * at 0, printed as a sorted table. */
final class QueueSizesKeeper extends Serializable {
  private val sizes = scala.collection.mutable.HashMap.empty[String, Long]

  def changeQueues(changes: Map[String, Long]): Unit =
    for ((q, d) <- changes)
      sizes(q) = math.max(0L, sizes.getOrElse(q, 0L) + d)

  def size(q: String): Long = sizes.getOrElse(q, 0L)

  override def toString: String =
    if (sizes.isEmpty) "No queue sizes tracked yet."
    else {
      val header = f"${"Queue Name"}%-30s ${"Current Size"}%20s"
      (Seq(header, "-" * header.length) ++
        sizes.keys.toSeq.sorted.map(q => f"$q%-30s ${sizes(q)}%20d")).mkString("\n")
    }
}
