package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Bench.driftEstimate]] — the round-10 gate arithmetic. The prior
  * gate's blind spot (round-9 verdict): drift = median per-query ratio
  * absorbs a UNIFORM code regression, because slowing the whole suite
  * moves the median exactly like box weather. The fix pairs a box-only
  * pure-CPU canary (primary estimator) with the median-query ratio
  * (cross-check); disagreement >15% in the slow direction is the
  * uniform regression, surfaced as a warning → exit 1. Pure function,
  * no Spark needed. */
class BenchGateSpec extends AnyFunSuite {

  private def ratios(r: Double, n: Int = 30): Seq[Double] = Seq.fill(n)(r)

  test("box drift alone: canary and median agree, no warning, canary wins") {
    // box 40% slower, suite 40% slower — weather, normalize it out
    val (d, src, warn) = Bench.driftEstimate(Some(4.2), Some(3.0), ratios(1.4))
    assert(math.abs(d - 1.4) < 1e-9)
    assert(src == "canary")
    assert(warn.isEmpty)
  }

  test("uniform CODE regression: suite slowed, box did not — flagged") {
    // canary flat (box identical), every query 1.4x — the exact case the
    // median-only gate normalized away as "drift"
    val (d, src, warn) = Bench.driftEstimate(Some(3.0), Some(3.0), ratios(1.4))
    assert(math.abs(d - 1.0) < 1e-9, "priors must be adjusted by BOX drift only")
    assert(src == "canary")
    assert(warn.nonEmpty, "a suite slowing 40% on a flat box is a code regression")
  }

  test("15% disagreement boundary: just-under passes, just-over flags") {
    val under = Bench.driftEstimate(Some(3.0), Some(3.0), ratios(1.14))._3
    val over = Bench.driftEstimate(Some(3.0), Some(3.0), ratios(1.16))._3
    assert(under.isEmpty)
    assert(over.nonEmpty)
  }

  test("uniform code IMPROVEMENT is not flagged") {
    // suite 30% faster on a flat box: good news, gate stays quiet
    val (d, _, warn) = Bench.driftEstimate(Some(3.0), Some(3.0), ratios(0.7))
    assert(math.abs(d - 1.0) < 1e-9)
    assert(warn.isEmpty)
  }

  test("mixed regime: box 20% slower AND code 40% slower — flagged, box-adjusted") {
    val (d, _, warn) = Bench.driftEstimate(Some(3.6), Some(3.0), ratios(1.2 * 1.4))
    assert(math.abs(d - 1.2) < 1e-9)
    assert(warn.nonEmpty)
  }

  test("pre-round-10 artifact (no prior canary): falls back to median ratio") {
    val (d, src, warn) = Bench.driftEstimate(Some(3.0), None, ratios(1.3))
    assert(math.abs(d - 1.3) < 1e-9)
    assert(src == "median_query_ratio")
    assert(warn.isEmpty) // nothing to cross-check against
  }

  test("too few stable queries (<20): canary alone, no cross-check") {
    val (d, src, warn) = Bench.driftEstimate(Some(4.5), Some(3.0), ratios(9.9, n = 5))
    assert(math.abs(d - 1.5) < 1e-9)
    assert(src == "canary")
    assert(warn.isEmpty)
  }

  test("no estimator at all: drift 1.0 (raw compare)") {
    val (d, src, warn) = Bench.driftEstimate(None, None, Nil)
    assert(d == 1.0 && src == "none" && warn.isEmpty)
  }

  test("non-positive canary samples are rejected, not divided by") {
    val (d, src, _) = Bench.driftEstimate(Some(0.0), Some(3.0), ratios(1.1))
    assert(src == "median_query_ratio" && math.abs(d - 1.1) < 1e-9)
    val (d2, src2, _) = Bench.driftEstimate(Some(3.0), Some(-1.0), ratios(1.1))
    assert(src2 == "median_query_ratio" && math.abs(d2 - 1.1) < 1e-9)
  }

  test("median is the statistic: one outlier query cannot move the estimate") {
    val rs = ratios(1.0, 29) :+ 25.0 // one real (non-uniform) regression
    val (d, _, warn) = Bench.driftEstimate(Some(3.0), Some(3.0), rs)
    assert(math.abs(d - 1.0) < 1e-9)
    assert(warn.isEmpty, "a single slow query is the per-query gate's job, not the drift flag's")
  }
}
