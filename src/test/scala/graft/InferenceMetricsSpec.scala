package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MetricsKeeper, QueueSizesKeeper}

class InferenceMetricsSpec extends AnyFunSuite {

  private class FakeClock(var now: Long) extends (() => Long) {
    def apply(): Long = now
  }

  test("window eviction: sums drop entries older than the window") {
    val clk = new FakeClock(0L)
    val m = new MetricsKeeper(windowMs = 10_000L, clock = clk)
    clk.now = 1000; m.addMetrics("tok" -> 100L)
    clk.now = 5000; m.addMetrics("tok" -> 50L)
    // at t=12s the t=1s entry is outside [2s, 12s]
    clk.now = 12_000; m.addMetrics("tok" -> 10L)
    val (lifetime, recent) = m.rates()("tok")
    assert(math.abs(lifetime - 160.0 / 12.0) < 1e-9)     // 160 over 12s
    assert(math.abs(recent - 60.0 / 10.0) < 1e-9)        // 50+10 over window
  }

  test("zeroed keys drop out of the recent table (reference <= 0 cleanup)") {
    val clk = new FakeClock(0L)
    val m = new MetricsKeeper(windowMs = 1000L, clock = clk)
    clk.now = 100; m.addMetrics("a" -> 5L)
    clk.now = 2000; m.addMetrics("b" -> 1L) // evicts the 'a' entry fully
    val r = m.rates()
    assert(r("a")._2 == 0.0)                // lifetime stays, recent is 0
    assert(r("a")._1 > 0.0)
  }

  test("window shorter than elapsed uses window seconds; elapsed shorter uses elapsed") {
    val clk = new FakeClock(0L)
    val m = new MetricsKeeper(windowMs = 300_000L, clock = clk)
    clk.now = 2000; m.addMetrics("x" -> 10L)
    val (lt, rc) = m.rates()("x")
    assert(math.abs(lt - 5.0) < 1e-9)   // 10 / 2s elapsed
    assert(math.abs(rc - 5.0) < 1e-9)   // window clamps to elapsed
  }

  test("reset clears everything") {
    val clk = new FakeClock(0L)
    val m = new MetricsKeeper(clock = clk)
    clk.now = 500; m.addMetrics("x" -> 3L)
    m.reset()
    assert(m.rates().isEmpty)
  }

  test("toString renders the sorted two-rate table") {
    val clk = new FakeClock(0L)
    val m = new MetricsKeeper(windowMs = 10_000L, clock = clk)
    clk.now = 1000; m.addMetrics("zz" -> 1L, "aa" -> 2L)
    val s = m.toString
    val lines = s.split("\n")
    assert(lines.head.contains("Lifetime (/sec)") && lines.head.contains("Recently (/sec)"))
    assert(lines(2).startsWith("aa") && lines(3).startsWith("zz"))
  }

  test("queue sizes floor at zero and render sorted") {
    val q = new QueueSizesKeeper()
    assert(q.toString == "No queue sizes tracked yet.")
    q.changeQueues(Map("running" -> 3L, "waiting" -> 5L))
    q.changeQueues(Map("running" -> -10L))
    assert(q.size("running") == 0L)      // capped, not negative
    assert(q.size("waiting") == 5L)
    val lines = q.toString.split("\n")
    assert(lines(2).startsWith("running") && lines(3).startsWith("waiting"))
  }
}
