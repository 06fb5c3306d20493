package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's load-variance / auto-retry decision logic —
  * pure functions, no SparkSession needed. The retry exists because
  * two recorded rounds shipped co-tenant-polluted numbers; these pin
  * the signal that triggers it and the pick-the-calmer-pass rule. */
class BenchSpec extends AnyFunSuite {

  private def q(name: String, cold: Double, warms: Double*) =
    (name, cold, warms.toSeq)

  test("loadVariance is the worst warm/warm ratio across queries") {
    val calm = Seq(q("a", 1.0, 0.50, 0.55), q("b", 2.0, 1.00, 1.10))
    assert(math.abs(Bench.loadVarianceOf(calm) - 1.1) < 1e-9)
    val spiked = Seq(q("a", 1.0, 0.50, 0.55), q("b", 2.0, 1.00, 9.00))
    assert(math.abs(Bench.loadVarianceOf(spiked) - 9.0) < 1e-9)
  }

  test("sub-50ms warm runs are noise-floor, never variance signal") {
    // a 4ms vs 40ms spread is scheduler jitter on an empty query, not
    // load — a 10x ratio here must NOT mark the whole bench noisy
    val tiny = Seq(q("w2", 0.1, 0.004, 0.040), q("b", 2.0, 1.00, 1.05))
    assert(math.abs(Bench.loadVarianceOf(tiny) - 1.05) < 1e-9)
    // no query with two above-floor warm runs → neutral 1.0
    assert(math.abs(Bench.loadVarianceOf(Seq(q("w2", 0.1, 0.004, 0.010))) - 1.0) < 1e-9)
  }

  test("pickCalmer keeps the pass with the lower variance; ties keep the first") {
    val noisy = Seq(q("a", 1.0, 1.0, 8.0))
    val calm = Seq(q("a", 1.0, 1.0, 1.1))
    assert(Bench.pickCalmer(noisy, calm)._1 eq calm)
    assert(Bench.pickCalmer(calm, noisy)._1 eq calm)
    assert(math.abs(Bench.pickCalmer(noisy, noisy)._2 - 8.0) < 1e-9)
    // equal variance: first pass wins (no churn on a calm box)
    val calm2 = Seq(q("a", 2.0, 2.0, 2.2))
    assert(Bench.pickCalmer(calm, calm2)._1 eq calm)
  }

  test("the retry threshold matches the recorded-pollution bar") {
    // variance 3.0 exactly is NOT noisy (strict >): warm spreads up to
    // 3x are within this box's observed calm-day jitter
    assert(!(3.0 > Bench.NoisyThreshold))
    assert(28.8 > Bench.NoisyThreshold) // the round-4 polluted run
  }
}
