package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Noise model: one untimed warmup pass (JIT + codegen + file-index caches
  * load once, as they would in any long-running service), then `RUNS`
  * timed, cache-isolated samples per query with the median reported — and
  * the samples are INTERLEAVED (whole-suite pass 1, then pass 2, then
  * pass 3) rather than back-to-back. Back-to-back samples defeat the
  * median against real interference: a host-load event lasting a few
  * minutes covers all three consecutive samples of every query in its
  * window, so a contiguous block of queries reads 2-10x slow (observed
  * twice in round 4, different blocks each run). Interleaving puts a
  * query's samples ~minutes apart, so one interference window can
  * contaminate at most one sample per query and the median discards it.
  * The 1-minute load average is stamped at start and after every pass so
  * any remaining interference is visible in the artifact itself. */
object Bench {
  // SPARK_GRAFT_BENCH_RUNS overrides for long scale runs (sf1+), where
  // per-query seconds are large enough that the median-of-3 noise armor
  // costs more wall-clock than the interference it guards against
  private val Runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map { v =>
    try v.trim.toInt catch { case _: NumberFormatException =>
      System.err.println(s"SPARK_GRAFT_BENCH_RUNS='$v' is not an integer"); sys.exit(2)
    }
  }.getOrElse(3)

  /** Drift adjudication for the compare gate — pure so the arithmetic is
    * unit-testable (the round-9 verdict's blind spot: a median-of-query-
    * ratios drift estimator ABSORBS a uniform code regression, because a
    * change that slows the whole suite moves the median exactly like box
    * weather does). The fix: a fixed pure-CPU canary runs inside every
    * bench pass; its cur/prev ratio measures the BOX alone (same
    * bytecode both runs, no I/O, no graft code), so it becomes the drift
    * estimator when both artifacts carry it, and the median-query ratio
    * demotes to a cross-check. The two disagreeing by >15% in the slow
    * direction IS the uniform code regression the old gate couldn't see
    * — surfaced as a non-empty warning the caller turns into exit 1.
    *
    * Returns (drift to adjust priors by, its source, optional warning).
    * Fallbacks: no prior canary (older artifact) → median-query ratio as
    * before; too few stable queries (<20) → canary alone, or 1.0. */
  def driftEstimate(canaryCur: Option[Double], canaryPrev: Option[Double],
                    queryRatios: Seq[Double]): (Double, String, Option[String]) = {
    val medianRatio =
      if (queryRatios.size >= 20) Some(queryRatios.sorted.apply(queryRatios.size / 2))
      else None
    val canaryRatio = for {
      c <- canaryCur if c > 0
      p <- canaryPrev if p > 0
    } yield c / p
    (canaryRatio, medianRatio) match {
      case (Some(cr), Some(mr)) =>
        val warn =
          if (mr > cr * 1.15) Some(
            f"median query ratio $mr%.3f exceeds box-only canary ratio $cr%.3f " +
              "by >15%% — the suite slowed more than the box did: uniform " +
              "CODE regression suspected (the case median-drift absorbs)")
          else if (mr < cr / 1.15) None // suite uniformly FASTER than box: improvement, fine
          else None
        (cr, "canary", warn)
      case (Some(cr), None) => (cr, "canary", None)
      case (None, Some(mr)) => (mr, "median_query_ratio", None)
      case (None, None)     => (1.0, "none", None)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle width defaults to core count (right at sf0.1); scale runs
    // override it — partition count must grow with data volume, exactly
    // as a cluster's would (see PLANS.md round 6: the sf10 second decade
    // goes super-linear at 32 partitions from per-partition spill, and
    // returns to linear when the width scales)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional isolation: SPARK_GRAFT_BENCH_ONLY=q29,q53 times just those
    // queries (prefix match), for attributing a single query's cost
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // drop blocks a query persisted but never released (operators can't
    // unpersist what they return lazily) — without this, cached shingle /
    // embedding tables pile up across the suite and the GC pressure lands
    // on whichever queries run AFTER the heavy ones, making their timings
    // unattributable
    def clearCaches(): Unit = {
      core.InternalCaches.release() // also drains the registry's strong refs
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val load0 = loadAvg()
    // a throwing query must read as an ERROR in the artifact, never as a
    // (fast) timing — round 4's events-schema breakage benched 7 exceptions
    // as 0.06s "speedups". Failed samples record -1 and the message lands
    // in an errors map; the warmup failure alone already marks the query.
    val errors = scala.collection.mutable.Map.empty[String, String]
    // SPARK_GRAFT_WARMUP_SF_DIR: run the warmup pass against a DIFFERENT
    // copy of the data (the cold-cache protocol: warm JIT/codegen/
    // classloading on a scratch copy, leave the measured dir's pages
    // untouched, evict between samples outside this JVM). Defaults to
    // the measured dir — the normal warm protocol is unchanged.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_SF_DIR", sfDir)
    ordered.foreach { case (name, fn) =>
      try fn(spark, warmupDir).count()
      catch { case t: Throwable =>
        errors(name) = t.toString.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
      }
      clearCaches()
    }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // the box-speed canary (same fixed pure-CPU codegen job as Probes):
    // no I/O, no graft code, one scalar shuffle — its seconds move with
    // host load/CPU weather and with NOTHING this repo changes, so its
    // cur/prev ratio across artifacts isolates box drift from code drift
    // (see driftEstimate). Fixed work (2e9 xxhash64) and fixed 32-way
    // split; comparable across runs at the same SPARK_GRAFT_CPUS.
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1, 32)
        .select(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(id))"))
        .first()
      (System.nanoTime() - t0) / 1e9
    }
    canary() // JIT-warm the canary path itself off the record
    val canarySamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passLoads = (1 to Runs).map { _ =>
      canarySamples += canary()
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case t: Throwable =>
            errors.getOrElseUpdate(name,
              t.toString.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200))
            false
          }
        samples(name) ::= (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        clearCaches()
      }
      loadAvg()
    }
    canarySamples += canary() // bracket the last pass too
    val canarySec = canarySamples.sorted.apply(canarySamples.size / 2)
    val results = ordered.map { case (name, _) =>
      val ss = samples(name)
      // any failed sample poisons the median to -1: a query that flakes
      // mid-bench is not "measured", it is broken
      name -> (if (ss.exists(_ < 0) || errors.contains(name)) -1.0
               else ss.sorted.apply(Runs / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val good = results.filter(_._2 >= 0)
    val total = if (good.nonEmpty) good.map(_._2).sum else 0.0
    val loads = passLoads.mkString("[", ",", "]")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val canaries = canarySamples.map(c => f"$c%.3f").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_errors":${errors.size},"sf":"$sfDir","runs_per_query":$Runs,"stat":"median","interleaved":true,"loadavg_start":$load0,"loadavg_pass_end":$loads,"canary_sec":${f"$canarySec%.3f"},"canary_samples":$canaries,"cpus":"$cpus"}"""
    println(line)
    // the driver captures only a log tail; persist the full line in-repo so
    // round-over-round comparison never depends on tail-capture luck.
    // Subset runs (BENCH_ONLY) skip the write — a 4-query debug run must
    // not overwrite the full-suite artifact.
    // Regression gate: `--compare prev.json` (or SPARK_GRAFT_BENCH_COMPARE)
    // exits non-zero with a NAMED list when any query present in the prior
    // artifact regresses >1.5x, newly errors, or goes missing — the round-4
    // garbage-lines incident was caught by a judge, not the harness; this
    // makes round-over-round drift a hard failure in the workflow itself.
    // Sub-second queries jitter well past 1.5x on a shared host, so a flag
    // additionally requires +0.5s absolute growth (documented noise floor).
    // The prior artifact LOADS BEFORE the new one is written, so comparing
    // against bench_full_last.json itself (the natural workflow) works.
    // The gate only makes sense against a FULL run: a BENCH_ONLY subset
    // would read every unrun query as MISSING (and with the compare path
    // set via env — the natural CI setup — every debug subset run would
    // exit 1). Subset runs skip the gate with a note.
    val comparePath = args.sliding(2).collectFirst {
      case Array("--compare", p) => p
    }.orElse(sys.env.get("SPARK_GRAFT_BENCH_COMPARE"))
      .filter { p =>
        val full = only.isEmpty
        if (!full) System.err.println(
          s"bench compare vs $p SKIPPED: subset run (SPARK_GRAFT_BENCH_ONLY)")
        full
      }
    val prevRoot = comparePath.map { path =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(path))
    }
    val prevQueries = prevRoot.map { root =>
      val node = root.get("queries")
      if (node == null) {
        System.err.println(s"bench compare: ${comparePath.get} has no 'queries' key — not a bench artifact")
        sys.exit(2)
      }
      node
    }
    // prior artifacts from before round 10 carry no canary — the gate
    // then falls back to the median-query-ratio estimator (documented
    // blind spot); from this round on, both numbers travel together.
    // The canary is a fixed-work SPARK job, so its seconds are comparable
    // only at the same SPARK_GRAFT_CPUS — a prior artifact from a
    // different width would read the parallelism change as box drift and
    // mis-normalize every query. Mismatch → median estimator, loudly.
    val prevCpus = prevRoot.flatMap(r => Option(r.get("cpus")).map(_.asText()))
    val cpusMatch = prevCpus.forall(_ == cpus)
    if (!cpusMatch) System.err.println(
      s"bench compare: prior artifact ran at cpus=${prevCpus.get}, this run " +
        s"at cpus=$cpus — canary seconds are not comparable across widths; " +
        "using the median-query drift estimator")
    val prevCanary = prevRoot.flatMap(r => Option(r.get("canary_sec")).map(_.asDouble()))
      .filter(_ > 0).filter(_ => cpusMatch)

    if (only.isEmpty) try {
      val out = java.nio.file.Paths.get("bench_full_last.json")
      java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()

    prevQueries.foreach { prev =>
      val path = comparePath.get
      val cur = results.toMap
      // DRIFT NORMALIZATION (the round-8 lesson): same-code full-suite
      // totals spanned 132.7-144.8 s (+-9%) across nights on this box, so
      // raw cross-run medians flag weather, not code — round 8 needed
      // hand-adjudication for q135/q72/q95, all of which cross-checked as
      // drift. The suite is its own canary: the MEDIAN per-query ratio
      // cur/prev over all stably-measurable queries (prev >= 0.1 s, both
      // runs clean) estimates the box-speed factor between the two runs —
      // a real code regression in a handful of queries cannot move a
      // median over ~200 queries, while uniform drift moves it exactly.
      // The gate then compares against drift-ADJUSTED priors: flag when
      // cur > prev*drift*1.5 AND cur - prev*drift > 0.5 s (same 1.5x /
      // 0.5 s thresholds as before, now measuring code instead of
      // weather). The one-invocation A/B/A/B pairing the round-8 verdict
      // sketched is impossible here — the baseline BINARY isn't runnable
      // in this JVM (the code changed); the canary normalization is the
      // same statistical pairing done through the artifact.
      val ratios = scala.collection.mutable.ArrayBuffer.empty[Double]
      prev.properties().forEach { e =>
        val (name, pv) = (e.getKey, e.getValue.asDouble())
        cur.get(name).foreach { cv =>
          if (pv >= 0.1 && cv >= 0) ratios += cv / pv
        }
      }
      // round-10: the box-only canary ratio is the PRIMARY estimator
      // when both artifacts carry one; the median-query ratio stays as
      // the cross-check whose disagreement (>15% slow) exposes exactly
      // the uniform code regression the old median-only gate absorbed
      val (drift, driftSource, driftWarn) =
        driftEstimate(Some(canarySec), prevCanary, ratios.toSeq)
      val medianRatio =
        if (ratios.size >= 20) ratios.sorted.apply(ratios.size / 2) else -1.0
      println(f"""{"bench_compare_drift":$drift%.4f,"drift_source":"$driftSource","median_query_ratio":$medianRatio%.4f,"canary_sec":$canarySec%.3f,"prev_canary_sec":${prevCanary.getOrElse(-1.0)}%.3f,"n_ratio_queries":${ratios.size},"vs":"$path"}""")
      val names = new scala.collection.mutable.ArrayBuffer[String]()
      prev.properties().forEach { e =>
        val (name, pv0) = (e.getKey, e.getValue.asDouble())
        val pv = pv0 * drift
        if (pv0 >= 0) cur.get(name) match {
          case None => names += s"$name: MISSING (prev ${f"$pv0%.2f"}s)"
          case Some(cv) if cv < 0 =>
            names += s"$name: ERROR (prev ${f"$pv0%.2f"}s, now failing)"
          case Some(cv) if cv > pv * 1.5 && cv - pv > 0.5 =>
            names += s"$name: ${f"$pv0%.2f"}s -> ${f"$cv%.2f"}s " +
              s"(${f"${cv / pv0}%.2f"}x raw, ${f"${cv / pv}%.2f"}x drift-adjusted)"
          case _ => ()
        }
      }
      driftWarn.foreach(w =>
        System.err.println(s"BENCH UNIFORM-REGRESSION FLAG vs $path: $w"))
      if (names.nonEmpty) {
        System.err.println(
          s"BENCH REGRESSION vs $path (${names.size}, drift ${f"$drift%.3f"} from $driftSource):")
        names.foreach(n => System.err.println(s"  $n"))
        sys.exit(1)
      } else if (driftWarn.nonEmpty) {
        sys.exit(1) // uniform slowdown with no single query over threshold
      } else println(
        s"bench compare vs $path: no regressions (drift ${f"$drift%.3f"} from $driftSource normalized out)")
    }
  }
}
