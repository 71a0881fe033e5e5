package graft

import graft.core.Canary

/** [[graft.core.Canary]] — conf-invariance of the box-drift instrument.
  *
  * The round-10 width harness caught the old agg-based canary moving
  * with the very conf under test: `spark.sql.shuffle.partitions=512`
  * arms read it at 3.3–5.8 s vs 1.3–1.7 s narrow, because the global
  * aggregate's final exchange inherited the width. An instrument that
  * moves with the conf cannot adjudicate a conf experiment. The round-11
  * canary is exchange-free BY CONSTRUCTION (range → xxhash64 projection
  * → noop sink); these specs pin that construction rather than trusting
  * a timing comparison on a shared box:
  *   - the executed plan contains no exchange node of any kind, and
  *   - the plan is byte-identical under 64 vs 512 shuffle partitions
  * — together those make its seconds independent of the width conf by
  * plan identity, which is stronger than "read the same ± noise". A
  * lenient timing check runs anyway, as the end-to-end witness. */
class CanarySpec extends SparkSpec {

  private def planUnder(width: String): String = {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, width)
      Canary.frame(spark, 1000000L).queryExecution.executedPlan.toString
    } finally spark.conf.set(key, saved)
  }

  test("the canary plan contains no exchange under narrow AND wide width conf") {
    Seq("64", "512").foreach { w =>
      val plan = planUnder(w)
      assert(!plan.contains("Exchange"),
        s"canary plan at shuffle.partitions=$w must be exchange-free:\n$plan")
      assert(!plan.toLowerCase.contains("shuffle"),
        s"canary plan at shuffle.partitions=$w must not shuffle:\n$plan")
    }
  }

  test("the canary plan is identical under 64 vs 512 shuffle partitions") {
    // expression ids (#123L) and plan ids are allocated per invocation;
    // strip them — the SHAPE is what must not move with the conf
    def norm(p: String): String = p.replaceAll("#\\d+L?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
    assert(norm(planUnder("64")) == norm(planUnder("512")),
      "a width-conf change must not alter the canary's executed plan")
  }

  test("canary seconds read the same +-noise under 64 vs 512 in one JVM") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val rows = 50000000L // ~100ms-scale: big enough to time, small enough for CI
    def med(w: String): Double = {
      spark.conf.set(key, w)
      Canary.seconds(spark, rows) // warm the path at this width
      Seq.fill(3)(Canary.seconds(spark, rows)).sorted.apply(1)
    }
    try {
      val narrow = med("64")
      val wide = med("512")
      // plan identity makes these the SAME work; the loose 2x bar only
      // absorbs shared-box noise, not a width effect (the round-10
      // witness was 2.4-3.4x in one direction)
      val ratio = wide / narrow
      assert(ratio < 2.0 && ratio > 0.5,
        f"canary moved with the width conf: 64->$narrow%.3fs 512->$wide%.3fs (x$ratio%.2f)")
    } finally spark.conf.set(key, saved)
  }

  test("canary work is deterministic: same row count, same hash stream") {
    val a = Canary.frame(spark, 1000L).collect().map(_.getLong(0))
    val b = Canary.frame(spark, 1000L).collect().map(_.getLong(0))
    assert(a.length == 1000 && a.sameElements(b))
  }
}
