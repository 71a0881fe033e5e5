package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted measurement probes — the apparatus behind PLANS.md's skew
  * and phase-attribution tables. Each subcommand builds its own session
  * (fresh-JVM isolation is the caller's job, as with `Bench`) and
  * prints ONE JSON line.
  *
  * `skew <sfDir> <plain|aqe|salted> [saltFactor]` — the same
  * lineitem⋈supplier revenue aggregation under three treatments of a
  * hot l_suppkey (run against a `MakeScale --skew-suppkey` dir):
  * plain = shuffle join with AQE's skew split OFF; aqe = skew split ON;
  * salted = the q67 [[operators.Skew.saltedJoin]] wrapper. All three
  * run with auto-broadcast DISABLED: at bench scale the 100k-row
  * supplier side would broadcast and no skew mechanism would engage at
  * all, but the 100 TB case this measures is a dimension too big to
  * broadcast — the shuffle-join spelling is the thing under test. For
  * the same reason the AQE skew thresholds are scaled DOWN from their
  * production defaults (256 MB partitions don't exist at sf1; at real
  * scale the defaults engage on their own). Every variant prints the
  * same result checksum — a treatment that changed the answer would be
  * a bug, not a tuning.
  *
  * `q152 <sfDir>` — phase attribution for the variant-shred query
  * (to_json → parse_json → variant_get×4 → groupBy): times cumulative
  * prefixes of the pipeline and reports per-phase deltas, the q29-style
  * table that explains a decade ratio instead of guessing at it. Each
  * prefix consumes its columns through an aggregate (column pruning
  * would otherwise skip the work being measured).
  */
object Probes {

  private def session(name: String, extra: Map[String, String]): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — controlled-experiment overrides
    // (e.g. autoBroadcastJoinThreshold=-1 to pin a join-strategy regime
    // on BOTH sides of a scale decade; the q94 attribution found 20 of
    // 38 joins flipping broadcast->sort-merge between sf1 and sf10,
    // which a raw decade ratio mistakes for super-linear operator work)
    val envExtra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val withExtra = (extra ++ envExtra).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
    val s = withExtra.getOrCreate()
    s.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    s
  }

  private def timed(runs: Int)(body: => Unit): Seq[Double] =
    (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("skew") => skew(args(1), args(2),
      args.lift(3).map(_.toInt).getOrElse(8))
    case Some("q152") => q152Phases(args(1))
    case Some("q76") => q76Phases(args(1), args.lift(2).getOrElse("all"))
    case Some("q94") => q94Phases(args(1), args.lift(2).getOrElse("all"))
    case Some("q94jvm") => q94JvmRounds(args(1), args.lift(2).map(_.toInt).getOrElse(5))
    case Some("q181") => q181Phases(args(1), args.lift(2).getOrElse("all"))
    case Some("q149") => q149Phases(args(1), args.lift(2).getOrElse("all"))
    case Some("q176") => q176Phases(args(1), args.lift(2).getOrElse("all"))
    case Some("streamfloor") => streamFloor(args(1),
      args.lift(2).getOrElse("q186_stream_histogram_quantiles"))
    case Some("decade") => decadePairs(args(1), args(2), args(3),
      args.lift(4).map(_.toInt).getOrElse(3))
    case Some("width") => widthPairs(args(1), args(2), args(3).toInt,
      args(4).toInt, args.lift(5).map(_.toInt).getOrElse(3))
    case Some("stages") => stagesOf(args(1), args(2))
    case Some("refile") => refile(args(1), args(2), args(3).toInt, args(4))
    case Some("q66") => q66Phases(args.lift(1).map(_.toInt).getOrElse(64))
    case Some("plan") => planOf(args(1), args(2))
    case Some("scanaudit") => scanAudit(args(1), args.lift(2).map(_.toInt).getOrElse(4))
    case _ =>
      System.err.println(
        "usage: Probes skew <sfDir> <plain|aqe|salted> [saltFactor] | " +
          "q152 <sfDir> | q76 <sfDir> [all|pairs3|pairs2|full] | " +
          "q94 <sfDir> [all|pairs|cc|full] | q94jvm <sfDir> [rounds] | " +
          "q181 <sfDir> [all|memb|pairs|full] | " +
          "streamfloor <sfDir> [queryName] | " +
          "decade <dirA> <dirB> <queryName> [rounds] | " +
          "width <sfDir> <queryName> <w1> <w2> [rounds] | " +
          "stages <queryName> <sfDir> | " +
          "refile <sfDir> <table> <n> <outDir> | q66 [nFiles] | " +
          "plan <queryName> <sfDir> | scanaudit <sfDir> [flagScans]")
      sys.exit(2)
  }

  // SPARK_GRAFT_PROBE_WARMUP=0 skips the untimed warmup run inside a
  // phase rung — the COLD-cache protocol: JIT/codegen warm on a scratch
  // copy of the data via SPARK_GRAFT_WARMUP_SF_DIR semantics is not
  // available inside a rung (the rung times ONE pipeline), so cold
  // samples instead run warmup-free with RUNS=1 in a fresh JVM after an
  // external page-cache evict (dev/evict_cache.py) — the first touch IS
  // the measurement. Cold numbers therefore bundle JIT with I/O; the
  // warm/cold DELTA isolates the page-cache term because the warm run
  // pays the same JIT.
  private def probeWarmup: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_PROBE_WARMUP", "1") != "0"

  /** Plan-multiplicity audit over EVERY SparkEntry query: runs each one
    * against a noop sink, collects every executed (final adaptive) plan
    * it fires (eagerly-checkpointed operators fire several), and flags
    * queries where a SINGLE plan contains ≥ `flagScans` source scans —
    * the fan-out disease: a multi-consumer frame whose upstream subtree
    * Catalyst inlines into every branch, so the source re-scans once per
    * consumer (ReuseExchange only dedupes identical exchanges, not
    * same-subtree-different-key consumers). Found this way and fixed with
    * `Checkpoints.cut`: q161 31 scans → tail of 0, q117 12 → 2, q176
    * 7 → 1. One JSON line per flagged query; a trailing summary line
    * always prints, so "flagged":0 is itself recorded evidence. */
  private def scanAudit(sfDir: String, flagScans: Int): Unit = {
    val spark = session("graft-scanaudit", Map.empty)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    ns: Long): Unit = plans.add(qe.executedPlan.toString)
      def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    e: Exception): Unit = ()
    })
    def count(s: String, pat: String): Int = pat.r.findAllIn(s).length
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = plans.size()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        // listener bus is async: wait for the plan count to go stable
        var stable = 0; var last = -1; var waited = 0
        while (stable < 2 && waited < 10000) {
          Thread.sleep(100); waited += 100
          val sz = plans.size()
          if (sz == last && sz > before) stable += 1 else stable = 0
          last = sz
        }
        import scala.jdk.CollectionConverters._
        val mine = plans.asScala.toSeq.drop(before)
        // the true fan-out signal is the SAME source path appearing many
        // times in ONE plan — N different tables scanned once each is a
        // normal join, and a persisted frame prints its child subtree
        // under InMemoryRelation even though execution reads the cache
        // (so raw FileScan counts overestimate for cached plans; the
        // cached_reads count disambiguates)
        def maxSamePath(p: String): Int = {
          val paths = "[\\w./-]+\\.(?:parquet|orc|csv|json|xlsx)"
            .r.findAllIn(p).toSeq
          if (paths.isEmpty) 0 else paths.groupBy(identity).values.map(_.size).max
        }
        val perPlan = mine.map(p => (maxSamePath(p), p))
        val (maxRescan, worst) =
          if (perPlan.isEmpty) (0, "") else perPlan.maxBy(_._1)
        if (maxRescan >= flagScans) {
          flagged += 1
          println(s"""{"query":"$name","n_execs":${mine.size}""" +
            s""","max_same_source_in_one_plan":$maxRescan""" +
            s""","cached_reads":${count(worst, "InMemoryTableScan|TableCacheQueryStage")}""" +
            s""","exchanges":${count(worst, "Exchange")}""" +
            s""","reused":${count(worst, "ReusedExchange")}}""")
        }
      } catch {
        case e: Exception =>
          println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}""")
      }
    }
    println(s"""{"probe":"scanaudit","sf":"$sfDir","flag_threshold":$flagScans""" +
      s""","queries":${SparkEntry.queries.size},"flagged":$flagged}""")
    spark.stop()
  }

  /** Print the EXECUTED (final adaptive) physical plan of any SparkEntry
    * query — `.explain` on the unexecuted frame shows the initial plan,
    * which hides what AQE actually did (exchange reuse, coalesce, skew
    * splits, runtime join demotions). Runs the query once against a noop
    * sink, then prints the plan the run actually used. The plan-audit
    * workflow: run this after touching any multi-consumer operator and
    * look for ReusedExchange/ReusedSubquery nodes where a frame fans out
    * to several joins. */
  private def planOf(queryName: String, sfDir: String): Unit = {
    val spark = session("graft-planprobe", Map.empty)
    // collect EVERY executed plan, not just the last: checkpointed
    // operators fire several actions per query, and the plan whose
    // join strategy flips across scales (the q94 broadcast->shuffle
    // regime boundary) is rarely the final one
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    ns: Long): Unit = plans.add(qe.executedPlan.toString)
      def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    e: Exception): Unit = ()
    })
    SparkEntry.queries(queryName)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // listener bus is async AND a query fires several plans: wait for the
    // COUNT to go stable, not merely non-empty — waiting for the first
    // plan alone dropped the main probe plan of a 3-job query (round-11:
    // q124's width witness had to fall back to the ScanWidth log line)
    var stable = 0; var last = -1; var waited = 0
    while (stable < 2 && waited < 10000) {
      Thread.sleep(100); waited += 100
      val sz = plans.size()
      if (sz == last && sz > 0) stable += 1 else stable = 0
      last = sz
    }
    import scala.jdk.CollectionConverters._
    plans.asScala.zipWithIndex.foreach { case (p, i) =>
      println(s"==== executed plan ${i + 1}/${plans.size} ====")
      println(p)
    }
    spark.stop()
  }

  /** q66 attribution: is the 0.44–0.47 s bench cost per-FILE work or the
    * FIXED overhead of the broadcast header-resolution design (grid parse
    * job + metadata agg + localCheckpoint + schema collect + broadcast
    * data pass)? Times the same multiSheetUnion at 2 files (the bench
    * fixture set) and at `nFiles` (the 2 fixtures copied round-robin),
    * plus a grid-parse-only rung at each count so the parse leg splits
    * from the resolution legs. If the 2→N cost grows far slower than N/2,
    * the sf0.1 number is the fixed job-structure cost — the price paid
    * ONCE per query for a resolution path with nothing driver-side that
    * scales in file count, which is the 100 TB trade the round-7 rework
    * made deliberately. */
  private def q66Phases(nFiles: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val spark = session("graft-q66probe", Map.empty)
    val src = Paths.get("src/test/resources/fixtures/xlsx_many")
    val base = Files.createTempDirectory("graft_q66probe")
    val many = base.resolve("many"); Files.createDirectory(many)
    val two = base.resolve("two"); Files.createDirectory(two)
    val fixtures = Files.list(src).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".xlsx")).sortBy(_.toString)
    fixtures.foreach(f => Files.copy(f, two.resolve(f.getFileName),
      StandardCopyOption.REPLACE_EXISTING))
    (0 until nFiles).foreach { i =>
      val f = fixtures(i % fixtures.length)
      Files.copy(f, many.resolve(s"copy_$i.xlsx"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    def gridOnly(dir: java.nio.file.Path): Unit =
      sources.ExcelReader.sheetsGridTagged(spark, s"$dir/*.xlsx").count()
    def full(dir: java.nio.file.Path): Unit =
      sources.ExcelReader.multiSheetUnion(spark, s"$dir/*.xlsx")
        .orderBy("source_file", "source_sheet", "row_idx")
        .write.format("noop").mode("overwrite").save()
    full(two) // warmup: codegen + classloading, untimed
    val g2 = timed(runs)(gridOnly(two)); val f2 = timed(runs)(full(two))
    val gN = timed(runs)(gridOnly(many)); val fN = timed(runs)(full(many))
    def fmt(xs: Seq[Double]) = f"${median(xs)}%.3f"
    println(s"""{"probe":"q66","n_files":$nFiles,"runs":$runs""" +
      s""","grid_2":${fmt(g2)},"full_2":${fmt(f2)}""" +
      s""","grid_n":${fmt(gN)},"full_n":${fmt(fN)}""" +
      s""","resolution_2":${f"${median(f2) - median(g2)}%.3f"}""" +
      s""","resolution_n":${f"${median(fN) - median(gN)}%.3f"}}""")
    spark.stop()
  }

  /** Rewrite one table of a scaled dir into `n` files (round-robin).
    * MakeScale's single-output-file layout makes the whole scan ONE map
    * task, and AQE's skew split subdivides a reduce partition along
    * map-output boundaries — one mapper means nothing to subdivide, so
    * the mechanism can never engage no matter how hot the key. A 100 TB
    * scan is thousands of map tasks; this restores that property for
    * the skew measurements. Values are untouched (same rows, same
    * checksums) — only file count changes. */
  private def refile(sfDir: String, table: String, n: Int, outDir: String): Unit = {
    val spark = session("graft-refile", Map.empty)
    spark.read.parquet(s"$sfDir/$table.parquet")
      .repartition(n)
      .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    println(s"""{"probe":"refile","table":"$table","n":$n,"out":"$outDir"}""")
    spark.stop()
  }

  private def skew(sfDir: String, variant: String, saltFactor: Int): Unit = {
    require(Set("plain", "aqe", "salted")(variant), s"variant $variant")
    val spark = session(s"graft-skewprobe-$variant", Map(
      // the 100 TB premise: dimension too big to broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> (variant == "aqe").toString,
      // production defaults (256 MB / factor 5) sized for real executors;
      // scaled to engage at bench partition sizes, same mechanism
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "8m"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        sys.env.getOrElse("SPARK_GRAFT_SKEW_FACTOR", "2.0"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        sys.env.getOrElse("SPARK_GRAFT_SKEW_ADVISORY", "4m"),
      // AQE splits a skewed REDUCE partition along MAP-output boundaries
      // — a fact this probe measured the hard way: the 75 MB single-file
      // lineitem scan is ONE map task at the 128 MB default, so the hot
      // partition arrives from one mapper and createSkewPartitionSpecs
      // has nowhere to cut (split count would be 1 → rule declines, the
      // DEBUG log shows "skewed partitions: left 0" despite a 13×-median
      // partition). A 100 TB scan is thousands of mappers, so the
      // realistic regime needs many map tasks — size scan splits down
      // for it with SPARK_GRAFT_MAX_PARTITION_BYTES.
      "spark.sql.files.maxPartitionBytes" ->
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m")))
    import graft.core.Tables
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("suppkey"),
        col("l_extendedprice"), col("l_discount"))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    def joined: DataFrame = {
      val j =
        if (variant == "salted")
          operators.Skew.saltedJoin(li, supp, Seq("suppkey"), saltFactor)
        else li.join(supp, Seq("suppkey"))
      j.groupBy("s_nationkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2))
          .as("revenue"), count(lit(1)).as("n_items"))
    }
    // capture the FINAL adaptive plan of each execution — "did AQE's
    // skew split actually engage" is a claim the timing table can't
    // settle by itself (an un-engaged mechanism and an engaged-but-
    // useless one read identically as "no speedup")
    @volatile var lastPlan = ""
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    ns: Long): Unit = lastPlan = qe.executedPlan.toString
      def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                    e: Exception): Unit = ()
    })
    // untimed: hot-key diagnostics + warmup (page cache, codegen)
    val hot = operators.Skew.heavyHitters(li, "suppkey", 1).head()
    val hotShare = hot.getDouble(hot.length - 1)
    val check = joined.agg(sum(round(col("revenue"), 0)).cast("long"),
      sum("n_items").cast("long"), count(lit(1))).head()
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val secs = timed(runs) { joined.write.format("noop").mode("overwrite").save() }
    // listener events are async — poll (bounded) rather than fixed-sleep
    val deadline = System.nanoTime() + 10000000000L
    while (lastPlan.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    // Spark 4 renders an engaged skew split as an AQEShuffleRead whose
    // partition spec is printed "skewed" (optionally with "coalesced"),
    // and the join node carries isSkewJoin=true. A bare "skew" match
    // would false-positive on the data directory PATH in FileScan nodes
    // (e.g. .../graft_sf1_skew4/...), so match the exact spellings.
    val skewEngaged = lastPlan.contains("skewed") || lastPlan.contains("isSkewJoin=true")
    sys.env.get("SPARK_GRAFT_DUMP_PLAN").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        lastPlan.getBytes("UTF-8"))
    }
    println(s"""{"probe":"skew","variant":"$variant","sf":"$sfDir"""" +
      s""","salt_factor":${if (variant == "salted") saltFactor else 0}""" +
      s""","hot_key_share":$hotShare""" +
      s""","runs":${secs.map(s => f"$s%.2f").mkString("[", ",", "]")}""" +
      s""","median":${f"${median(secs)}%.2f"}""" +
      s""","aqe_skew_engaged":$skewEngaged""" +
      s""","checksum":[${check.getLong(0)},${check.getLong(1)},${check.getLong(2)}]}""")
    spark.stop()
  }

  /** q76 decade attribution: q76 should cost ~ q29 (the pairs join on a
    * slightly bigger corpus) + a small connected-components leg over the
    * ~10^5 true-pair edges — but it measures far above q29 at sf10.
    * Times (a) the pairs join alone on q76's three-way corpus,
    * (b) the pairs join on q29's two-way corpus for reference,
    * (c) full q76 — the (c)-(a) delta is the CC + groupBy leg. */
  /** `rung` selects ONE phase ("pairs3" | "pairs2" | "full") so the
    * caller can give each phase its own fresh JVM — the lesson of the
    * first all-in-one sf10 run: within a single JVM the FIRST rung pays
    * JIT compilation and heap-growth costs the later rungs inherit for
    * free, and at sf10 that ordering bias was larger than the phase
    * split itself (the pairs rung read 64.8 s while the FULL query —
    * which contains that same pairs join — read 48.8 s right after it).
    * "all" keeps the one-JVM behavior for quick sf0.1/sf1 looks, where
    * the bias is small next to the phases. */
  private def q76Phases(sfDir: String, rung: String): Unit = {
    require(Set("all", "pairs3", "pairs2", "full")(rung), s"rung $rung")
    val spark = session("graft-q76-phases", Map.empty)
    import graft.core.Tables
    import graft.operators.Dedup
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val m1 = base.where(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", concat(col("text"), lit(" extra suffix token")))
    val m2 = base.where(col("doc_id") % 22 === 0)
      .withColumn("doc_id", col("doc_id") + 400000)
      .withColumn("text", concat(col("text"), lit(" extra suffix added")))
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    def m(body: => Unit): Double = { body; median(timed(runs)(body)) } // 1 warmup
    def f(d: Double) = f"$d%.2f"
    def doRung(name: String): (Double, Long) = name match {
      case "pairs3" =>
        var n = 0L
        val t = m { n = Dedup.jaccardPairsPrefixFilter(
          base.unionByName(m1).unionByName(m2), "doc_id", "text", 3, 0.5).count() }
        (t, n)
      case "pairs2" =>
        var n = 0L
        val t = m { n = Dedup.jaccardPairsPrefixFilter(
          base.unionByName(m1), "doc_id", "text", 3, 0.5).count() }
        (t, n)
      case "full" =>
        (m(SparkEntry.queries("q76_neardup_components")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()), -1L)
    }
    if (rung == "all") {
      val (tPairs3, nPairs3) = doRung("pairs3")
      val (tPairs2, nPairs2) = doRung("pairs2")
      val (tFull, _) = doRung("full")
      println(s"""{"probe":"q76_phases","sf":"$sfDir","runs_per_point":$runs""" +
        s""","pairs_3way":${f(tPairs3)},"n_pairs_3way":$nPairs3""" +
        s""","pairs_2way_q29corpus":${f(tPairs2)},"n_pairs_2way":$nPairs2""" +
        s""","full":${f(tFull)},"cc_plus_tail":${f(tFull - tPairs3)}}""")
    } else {
      val (t, n) = doRung(rung)
      println(s"""{"probe":"q76_phases","sf":"$sfDir","rung":"$rung"""" +
        s""","runs_per_point":$runs,"median":${f(t)}""" +
        (if (n >= 0) s""","n_pairs":$n}""" else "}"))
    }
    spark.stop()
  }

  /** q94 decade attribution — the round-8 verdict's #1 ask: q94
    * (pairs → connected components → keep-min anti-join) read 12.3-14.3×
    * across warm regimes at the sf1→sf10 decade vs the family's ≤12×
    * bar, and was adjudicated as page-cache variance but never
    * phase-attributed the way q76/q152 were. Rungs, each meant for its
    * OWN fresh JVM (the q76 lesson: the first rung in a shared JVM pays
    * JIT + heap growth the later rungs inherit):
    *   pairs = the PPJoin prefix-filter join on q94's exact corpus
    *           (base + mod-11 suffix mutants);
    *   cc    = pairs + connected components over the true-pair edges
    *           (delta vs `pairs` = the CC loop);
    *   full  = the whole q94 query (delta vs `cc` = the keep-min
    *           anti-join + final agg).
    * Cache regime is a PROTOCOL here, not an accident: Spark-level
    * caches (the operator-internal docs persist + CC checkpoints) are
    * cleared between samples exactly as Bench does, so every sample
    * recomputes the pipeline; the PAGE-cache regime is set externally —
    * dev/evict_cache.py before a cold sample, a prior touch for warm —
    * and SPARK_GRAFT_WARMUP_SF_DIR points the untimed JIT warmup at a
    * scratch COPY of the data so warming the compiler doesn't warm the
    * measured dir's pages. */
  private def q94Phases(sfDir: String, rung: String): Unit = {
    require(Set("all", "pairs", "cc", "full")(rung), s"rung $rung")
    val spark = session("graft-q94-phases", Map.empty)
    import graft.core.Tables
    import graft.operators.Dedup
    def corpus(d: String) = {
      val base = Tables.documents(spark, d).select("doc_id", "text")
      val m1 = base.where(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", concat(col("text"), lit(" extra suffix token")))
      base.unionByName(m1)
    }
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val warmDir = sys.env.get("SPARK_GRAFT_WARMUP_SF_DIR")
    def clear(): Unit = {
      core.InternalCaches.release() // also drains the registry's strong refs
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def samples(body: String => Unit): Seq[Double] = {
      if (probeWarmup) { body(warmDir.getOrElse(sfDir)); clear() }
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body(sfDir)
        val t = (System.nanoTime() - t0) / 1e9; clear(); t
      }
    }
    var n = -1L
    val secs = rung match {
      case "pairs" => samples { d =>
        n = Dedup.jaccardPairsPrefixFilter(corpus(d), "doc_id", "text", 3, 0.5)
          .count()
      }
      case "cc" => samples { d =>
        val pairs =
          Dedup.jaccardPairsPrefixFilter(corpus(d), "doc_id", "text", 3, 0.5)
        n = Dedup.connectedComponents(pairs, "id_a", "id_b").count()
      }
      case "full" | "all" => samples { d =>
        SparkEntry.queries("q94_neardup_dedup")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    def f(d: Double) = f"$d%.2f"
    println(s"""{"probe":"q94_phases","sf":"$sfDir","rung":"$rung"""" +
      s""","runs":${secs.map(f).mkString("[", ",", "]")}""" +
      s""","median":${f(median(secs))}""" +
      s""","warmup":$probeWarmup,"warmup_dir":${warmDir.map("\"" + _ + "\"").getOrElse("null")}""" +
      (if (n >= 0) s""","n_rows":$n}""" else "}"))
    spark.stop()
  }

  /** q181 phase attribution (round-12 verdict #4): where the
    * co-occurrence query's ~3 s goes. Rungs, each meant for its own
    * fresh JVM (the q76 lesson):
    *   memb  = membership dedupe + basket sizing + the eager
    *           localCheckpoint — the input build;
    *   pairs = memb + the basket self-join + (ia,ib) aggregation with
    *           the support filter — the quadratic middle (delta vs memb);
    *   full  = the whole q181 query (delta vs pairs = the lift stat
    *           joins + final sort). Same parameters as the bench query
    *           (lineitem, minSupport=2, maxBasket default). */
  private def q181Phases(sfDir: String, rung: String): Unit = {
    require(Set("all", "memb", "pairs", "full")(rung), s"rung $rung")
    val spark = session("graft-q181-phases", Map.empty)
    import graft.core.Tables
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    def clear(): Unit = {
      core.InternalCaches.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def samples(body: String => Unit): Seq[Double] = {
      if (probeWarmup) { body(sfDir); clear() }
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body(sfDir)
        val t = (System.nanoTime() - t0) / 1e9; clear(); t
      }
    }
    // the stages come from Association itself (round-13 ADVICE: an
    // inline copy here would silently desynchronize on any operator
    // change, and the phase attribution would then measure a pipeline
    // the bench no longer runs); parameters match the bench query
    def sized(d: String) = operators.Association.basketItems(
      Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i")),
      "b", "i", maxBasket = 10000)
    var n = -1L
    val secs = rung match {
      case "memb" => samples { d => n = sized(d).count() }
      case "pairs" => samples { d =>
        n = operators.Association.pairSupports(sized(d), minSupport = 2).count()
      }
      case "full" | "all" => samples { d =>
        SparkEntry.queries("q181_item_cooccurrence")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    def f(d: Double) = f"$d%.2f"
    println(s"""{"probe":"q181_phases","sf":"$sfDir","rung":"$rung"""" +
      s""","runs":${secs.map(f).mkString("[", ",", "]")}""" +
      s""","median":${f(median(secs))},"warmup":$probeWarmup""" +
      (if (n >= 0) s""","n_rows":$n}""" else "}"))
    spark.stop()
  }

  /** q149 phase attribution (round-13 verdict #6): the suite's most
    * expensive query (3.78 s anchor min) is PPJoin pairs → connected
    * components → struct-max keeper → anti-join. Rungs, each meant for
    * its own fresh JVM (the q76 lesson), cut at the OPERATOR boundaries
    * so every stage is the exact public entry point the query calls —
    * no inline re-implementation to desynchronize (the q181-rig ADVICE):
    *   pairs = corpus build + Dedup.jaccardPairsPrefixFilter — the
    *           prefix-filter inverted index + verification;
    *   cc    = pairs + Dedup.connectedComponents (delta vs pairs = the
    *           pointer-jump loop + checkpoint);
    *   full  = the whole q149 query (delta vs cc = scored join,
    *           struct-max keeper, anti-join, final agg).
    * Corpus spelling matches SparkEntry's q149 body (documents ∪ an
    * 1/11 mutated copy). */
  private def q149Phases(sfDir: String, rung: String): Unit = {
    require(Set("all", "pairs", "cc", "full")(rung), s"rung $rung")
    val spark = session("graft-q149-phases", Map.empty)
    import graft.core.Tables
    import graft.operators.Dedup
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    def clear(): Unit = {
      core.InternalCaches.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def samples(body: String => Unit): Seq[Double] = {
      if (probeWarmup) { body(sfDir); clear() }
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body(sfDir)
        val t = (System.nanoTime() - t0) / 1e9; clear(); t
      }
    }
    def corpus(d: String) = {
      val base = Tables.documents(spark, d).select("doc_id", "text")
      val m1 = base.where(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", concat(col("text"), lit(" extra suffix token")))
      base.unionByName(m1)
    }
    def pairs(d: String) =
      Dedup.jaccardPairsPrefixFilter(corpus(d), "doc_id", "text", 3, 0.5)
    var n = -1L
    val secs = rung match {
      case "pairs" => samples { d => n = pairs(d).count() }
      case "cc" => samples { d =>
        n = Dedup.connectedComponents(pairs(d), "id_a", "id_b").count()
      }
      case "full" | "all" => samples { d =>
        SparkEntry.queries("q149_dedup_keep_best")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    def f(d: Double) = f"$d%.2f"
    println(s"""{"probe":"q149_phases","sf":"$sfDir","rung":"$rung"""" +
      s""","runs":${secs.map(f).mkString("[", ",", "]")}""" +
      s""","median":${f(median(secs))},"warmup":$probeWarmup""" +
      (if (n >= 0) s""","n_rows":$n}""" else "}"))
    spark.stop()
  }

  /** q176 phase attribution: madOutliers is the last unattributed
    * heavy (2.59 s anchor min) — two exact per-group ranking passes plus
    * the final gate aggregation over lineitem (600k rows, THREE groups,
    * so each window sort runs on 3 tasks of a 32-thread box). Rungs cut
    * at the operator's own package-private stages (the q181-rig ADVICE:
    * no inline re-spelling):
    *   cents = scan + half-cent projection (I/O floor);
    *   med   = cents + first ranking pass + boundary agg;
    *   dev   = med + broadcast-back + deviation stamp;
    *   mad   = dev + second ranking pass;
    *   full  = the whole q176 query to noop (delta vs mad = the gate
    *           count aggregation + the med/dev re-derivation the lazy
    *           no-materialize choice accepts). */
  private def q176Phases(sfDir: String, rung: String): Unit = {
    require(Set("all", "cents", "med", "dev", "mad", "full",
      "selmed", "selmad")(rung), s"rung $rung")
    val spark = session("graft-q176-phases", Map.empty)
    import graft.core.Tables
    import graft.operators.Quantiles
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    def samples(body: String => Unit): Seq[Double] = {
      if (probeWarmup) body(sfDir)
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body(sfDir)
        (System.nanoTime() - t0) / 1e9
      }
    }
    def cents(d: String) = Quantiles.madCents(
      Tables.lineitem(spark, d), "l_returnflag", "l_extendedprice")
    var n = -1L
    val secs = rung match {
      case "cents" => samples { d => n = cents(d).count() }
      case "med" => samples { d =>
        n = Quantiles.exactGroupQuantiles(cents(d), "l_returnflag", "c2",
          Seq(0.5), Seq("med2")).count()
      }
      // selection-spelling twins of med/mad: the skew-safe variant over
      // the same stages, for window-vs-selection scale comparisons
      case "selmed" => samples { d =>
        n = Quantiles.exactGroupQuantilesSkewSafe(cents(d), "l_returnflag",
          "c2", Seq(0.5), Seq("med2")).count()
      }
      case "selmad" => samples { d =>
        val dev = cents(d)
          .join(broadcast(Quantiles.exactGroupQuantilesSkewSafe(cents(d),
            "l_returnflag", "c2", Seq(0.5), Seq("med2"))), "l_returnflag")
          .withColumn("dev2", abs(col("c2").cast("double") - col("med2")))
        n = Quantiles.exactGroupQuantilesSkewSafe(dev, "l_returnflag",
          "dev2", Seq(0.5), Seq("mad2")).count()
      }
      case "dev" => samples { d =>
        n = Quantiles.madDeviations(cents(d), "l_returnflag").count()
      }
      case "mad" => samples { d =>
        n = Quantiles.madScale(
          Quantiles.madDeviations(cents(d), "l_returnflag"),
          "l_returnflag").count()
      }
      case "full" | "all" => samples { d =>
        SparkEntry.queries("q176_mad_outliers")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    def f(d: Double) = f"$d%.2f"
    println(s"""{"probe":"q176_phases","sf":"$sfDir","rung":"$rung"""" +
      s""","runs":${secs.map(f).mkString("[", ",", "]")}""" +
      s""","median":${f(median(secs))},"warmup":$probeWarmup""" +
      (if (n >= 0) s""","n_rows":$n}""" else "}"))
    spark.stop()
  }

  /** Streaming fixed-overhead attribution (round-12 verdict #5): six of
    * the bench's top-15 queries are micro-batch drains, and the open
    * question is how much of their per-query seconds is the FLOOR
    * (query start, file-source listing, stop/drain latency — costs that
    * do not grow with data or state) versus inside-batch work. The
    * engine's own progress stream answers it: per batch, `durationMs`
    * splits triggerExecution into addBatch (state + sink work),
    * getBatch/latestOffset (source), queryPlanning, walCommit/
    * commitOffsets (checkpoint bookkeeping). This rig drains the named
    * SparkEntry streaming query while summing those keys across batches;
    * overhead_sec = wall − Σ triggerExecution is the floor the progress
    * stream cannot see (start/stop + inter-batch gaps). */
  private def streamFloor(sfDir: String, queryName: String): Unit = {
    val spark = session("graft-stream-floor", Map.empty)
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    def clear(): Unit = {
      core.InternalCaches.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        buf.add(e.progress)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    def drain(): Unit = SparkEntry.queries(queryName)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    if (probeWarmup) { drain(); clear() }
    val keys = Seq("triggerExecution", "addBatch", "getBatch", "latestOffset",
      "queryPlanning", "walCommit", "commitOffsets")
    import scala.jdk.CollectionConverters._
    val rows = (1 to runs).map { _ =>
      buf.clear()
      val t0 = System.nanoTime()
      drain()
      val wall = (System.nanoTime() - t0) / 1e9
      // the listener bus is async: drain it EXACTLY before reading the
      // buffer (a fixed sleep can drop the final batch's progress event
      // on a loaded host and overstate overhead_sec — the very floor
      // this probe measures). Fallback: poll until the buffer is stable.
      try org.apache.spark.graftglue.BusGlue.waitUntilEmpty(
        spark.sparkContext, 10000)
      catch { case _: Throwable =>
        var last = -1
        var stable = 0
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (stable < 3 && System.nanoTime() < deadline) {
          Thread.sleep(100)
          val n = buf.size()
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
      }
      val ps = buf.asScala.toSeq
      val sums = keys.map(k => k ->
        ps.flatMap(p => Option(p.durationMs.get(k)).map(_.longValue)).sum).toMap
      clear()
      (wall, ps.size, ps.map(_.numInputRows).sum, sums)
    }
    spark.streams.removeListener(listener)
    def f(d: Double) = f"$d%.3f"
    val runJson = rows.map { case (wall, nb, inRows, sums) =>
      s"""{"wall":${f(wall)},"batches":$nb,"input_rows":$inRows,""" +
        keys.map(k => s""""${k}_ms":${sums(k)}""").mkString(",") +
        s""","overhead_sec":${f(wall - sums("triggerExecution") / 1000.0)}}"""
    }.mkString("[", ",", "]")
    val medWall = median(rows.map(_._1))
    val medTrig = rows.map(_._4("triggerExecution").toDouble).sorted.apply(rows.size / 2)
    println(s"""{"probe":"stream_floor","query":"$queryName","sf":"$sfDir"""" +
      s""","runs_per_point":$runs,"median_wall":${f(medWall)}""" +
      s""","median_trigger_ms":${medTrig.toLong}""" +
      s""","median_overhead_sec":${f(medWall - medTrig / 1000.0)}""" +
      s""","runs":$runJson}""")
    spark.stop()
  }

  /** q94 phase rounds timed ADJACENTLY inside ONE JVM, order-rotated —
    * the round-9 escalation after both fresh-JVM sweeps (blocked AND
    * interleaved) drowned the rung deltas in between-JVM drift: the
    * same cc rung read 74.6–351.7 s across fresh JVMs on a quiet box,
    * a 4.7× spread that no (pairs, cc, full) subtraction survives,
    * while cold-vs-warm page cache moved medians by ~nothing (the r8
    * "cache regime" adjudication does not hold). Inside one JVM the
    * three phases of a round run seconds apart — the tightest temporal
    * pairing available — and the per-round ORDER rotates so JIT depth,
    * heap shape, and any monotone drift average out of the deltas
    * instead of landing on whichever rung runs first. Spark-level
    * caches + the internal-cache registry are drained between phases,
    * so each phase recomputes its full pipeline. One JSON line per
    * round; the statistic is the WITHIN-round deltas (cc−pairs = the
    * CC loop, full−cc = the keep-min anti-join + agg), medianed across
    * rounds downstream. */
  /** Per-phase task-metric accumulator — the discriminator behind the
    * q94 drift investigation. For every timed phase it sums, across all
    * tasks the phase fired: executor run time (wall inside tasks), CPU
    * time (on-CPU nanoseconds the kernel actually granted), JVM GC time
    * inside tasks, shuffle bytes both ways, and memory+disk spill. The
    * three drift hypotheses separate cleanly on these: host CPU-steal →
    * cpu_ms stable while wall swings (the work is the same, the clock
    * isn't); GC regime → gc_ms swings with wall; a plan flip → task
    * count / shuffle bytes change between runs of the SAME query. */
  private final class PhaseMetrics extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val tasks, runMs, cpuMs, gcMs, shRead, shWrite, spill = new AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        runMs.addAndGet(m.executorRunTime)
        cpuMs.addAndGet(m.executorCpuTime / 1000000L)
        gcMs.addAndGet(m.jvmGCTime)
        shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def snap(): Map[String, Long] = Map(
      "tasks" -> tasks.get, "run_ms" -> runMs.get, "cpu_ms" -> cpuMs.get,
      "gc_ms" -> gcMs.get, "sh_read_mb" -> shRead.get / (1 << 20),
      "sh_write_mb" -> shWrite.get / (1 << 20), "spill_mb" -> spill.get / (1 << 20))
  }

  private def q94JvmRounds(sfDir: String, rounds: Int): Unit = {
    val spark = session("graft-q94-jvm", Map.empty)
    import graft.core.Tables
    import graft.operators.Dedup
    val metrics = new PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)
    def corpus(d: String) = {
      val base = Tables.documents(spark, d).select("doc_id", "text")
      val m1 = base.where(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("text", concat(col("text"), lit(" extra suffix token")))
      base.unionByName(m1)
    }
    def clear(): Unit = {
      core.InternalCaches.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def body(rung: String, d: String): Unit = rung match {
      case "pairs" =>
        Dedup.jaccardPairsPrefixFilter(corpus(d), "doc_id", "text", 3, 0.5).count()
      case "cc" =>
        val pairs = Dedup.jaccardPairsPrefixFilter(corpus(d), "doc_id", "text", 3, 0.5)
        Dedup.connectedComponents(pairs, "id_a", "id_b").count()
      case "full" =>
        SparkEntry.queries("q94_neardup_dedup")(spark, d)
          .write.format("noop").mode("overwrite").save()
    }
    // canary: a fixed pure-CPU codegen job (no I/O, no graft code, and —
    // round 11 — no exchange, so a width conf change between phases
    // cannot move it; see core.Canary) — its wall time tracks the box's
    // EFFECTIVE speed at this instant, independent of anything q94 does.
    // Runs before every phase. Canary values are compared only WITHIN
    // one probe run's JSONL, so the round-11 work change (8e9 agg → 2e9
    // noop projection) does not break any cross-artifact arithmetic.
    def canary(): Double = core.Canary.seconds(spark)
    val rungs = Vector("pairs", "cc", "full")
    if (probeWarmup) { // JIT-warm every phase's code path off the clock
      val wd = sys.env.getOrElse("SPARK_GRAFT_WARMUP_SF_DIR", sfDir)
      canary(); rungs.foreach { r => body(r, wd); clear() }
    }
    def f(d: Double) = f"$d%.2f"
    (1 to rounds).foreach { round =>
      val order = (0 until 3).map(i => rungs((i + round - 1) % 3))
      val results = order.map { r =>
        val cw = canary()
        val before = metrics.snap()
        val t0 = System.nanoTime(); body(r, sfDir)
        val t = (System.nanoTime() - t0) / 1e9; clear()
        val after = metrics.snap()
        val d = after.map { case (k, v) => k -> (v - before(k)) }
        r -> ((t, cw, d))
      }.toMap
      def m(r: String): String = {
        val (t, cw, d) = results(r)
        s""""$r":${f(t)},"${r}_canary":${f(cw)},"${r}_m":{${
          d.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
      }
      println(s"""{"probe":"q94_jvm","sf":"$sfDir","round":$round""" +
        s""","order":${order.map("\"" + _ + "\"").mkString("[", ",", "]")}""" +
        s""",${m("pairs")},${m("cc")},${m("full")}""" +
        s""","d_cc":${f(results("cc")._1 - results("pairs")._1)}""" +
        s""","d_tail":${f(results("full")._1 - results("cc")._1)}}""")
    }
    spark.stop()
  }

  /** Paired scale-step measurement — the round-9 third-decade
    * instrument. Between-JVM wall subtraction proved unusable on this
    * box (same rung, same data: 74.6–351.7 s across six fresh JVMs,
    * Q94_JVM investigation), so the dirA→dirB ratio is measured the way
    * the bench `--compare` gate pairs A/B: BOTH scales run adjacently
    * inside ONE JVM, order rotated per round, a pure-CPU canary before
    * each timed run, and per-run summed task metrics. CPU and shuffle
    * ratios are the drift-immune numerators; the wall ratio is reported
    * but adjudicated against the canary pair. One JSONL line per round;
    * medians computed downstream (drop round 1 — GC/JIT regime still
    * settling, same rule as q94jvm). */
  private def decadePairs(dirA: String, dirB: String, query: String,
                          rounds: Int): Unit = {
    val spark = session("graft-decade", Map.empty)
    val metrics = new PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)
    val q = SparkEntry.queries(query)
    def clear(): Unit = {
      core.InternalCaches.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // force shuffle-file reclamation between runs: the ContextCleaner
      // only removes a run's shuffle files once its ShuffleDependencies
      // are GC'd, and a paired (sf10 + sf30) round otherwise holds BOTH
      // scales' files simultaneously (measured: 18 GB + 56 GB > the
      // sandbox disk — two ENOSPC-killed JVMs before this line existed)
      System.gc()
      Thread.sleep(3000)
    }
    def body(d: String): Unit =
      q(spark, d).write.format("noop").mode("overwrite").save()
    def canary(): Double = core.Canary.seconds(spark) // exchange-free; see core.Canary
    if (probeWarmup) { // JIT-warm the query's code path off the clock
      val wd = sys.env.getOrElse("SPARK_GRAFT_WARMUP_SF_DIR", dirA)
      canary(); body(wd); clear()
    }
    def f(d: Double) = f"$d%.2f"
    val dirs = Vector("a" -> dirA, "b" -> dirB)
    (1 to rounds).foreach { round =>
      val order = if (round % 2 == 1) dirs else dirs.reverse
      val results = order.map { case (tag, d) =>
        val cw = canary()
        val before = metrics.snap()
        val t0 = System.nanoTime(); body(d)
        val t = (System.nanoTime() - t0) / 1e9; clear()
        val after = metrics.snap()
        val delta = after.map { case (k, v) => k -> (v - before(k)) }
        tag -> ((t, cw, delta))
      }.toMap
      def m(tag: String): String = {
        val (t, cw, d) = results(tag)
        s""""$tag":${f(t)},"${tag}_canary":${f(cw)},"${tag}_m":{${
          d.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
      }
      val (ta, _, da) = results("a")
      val (tb, _, db) = results("b")
      val cpuR =
        if (da("cpu_ms") > 0) db("cpu_ms").toDouble / da("cpu_ms") else -1.0
      val shR = {
        val aw = da("sh_write_mb")
        if (aw > 0) db("sh_write_mb").toDouble / aw else -1.0
      }
      println(s"""{"probe":"decade","query":"$query","dir_a":"$dirA"""" +
        s""","dir_b":"$dirB","round":$round""" +
        s""","order":${order.map(o => "\"" + o._1 + "\"").mkString("[", ",", "]")}""" +
        s""",${m("a")},${m("b")}""" +
        s""","wall_ratio":${f(tb / ta)},"cpu_ratio":${f(cpuR)}""" +
        s""","shuffle_ratio":${f(shR)}}""")
    }
    spark.stop()
  }

  /** Within-JVM shuffle-WIDTH pairing at ONE scale — the round-10
    * instrument for the last open q94 term. The sf30 campaign's width
    * hypothesis ("fixed 64 partitions turn a 3× data step into
    * 3×-deeper per-partition sorts") could not be tested across JVMs
    * (±50% between-JVM drift) or across paired scales (ENOSPC holding
    * both scales' shuffle files); but `spark.sql.shuffle.partitions`
    * is a RUNTIME conf, so one JVM alternates the two widths on the
    * same data, order rotated per round — the decadePairs protocol
    * with width, not scale, as the treatment. AQE stays on in both
    * arms: the wide arm is exactly the DEPLOY prescription ("set the
    * initial width high, let AQE coalesce to its advisory"), so the
    * comparison falsifies or confirms the PRESCRIPTION, not a strawman
    * with AQE off. spill_mb is the mechanism witness: the depth term
    * predicts spill at the narrow width and its absence at the wide. */
  private def widthPairs(sfDir: String, query: String, w1: Int, w2: Int,
                         rounds: Int): Unit = {
    val spark = session("graft-width", Map.empty)
    val metrics = new PhaseMetrics
    spark.sparkContext.addSparkListener(metrics)
    val q = SparkEntry.queries(query)
    def clear(): Unit = {
      core.InternalCaches.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc() // let the ContextCleaner reclaim shuffle files (disk!)
      Thread.sleep(3000)
    }
    def body(w: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", w.toString)
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    def canary(): Double = core.Canary.seconds(spark) // exchange-free; see core.Canary
    if (probeWarmup) {
      val wd = sys.env.getOrElse("SPARK_GRAFT_WARMUP_SF_DIR", sfDir)
      canary(); body(w1); clear()
    }
    def f(d: Double) = f"$d%.2f"
    val arms = Vector("narrow" -> w1, "wide" -> w2)
    (1 to rounds).foreach { round =>
      val order = if (round % 2 == 1) arms else arms.reverse
      val results = order.map { case (tag, w) =>
        val cw = canary()
        val before = metrics.snap()
        val t0 = System.nanoTime(); body(w)
        val t = (System.nanoTime() - t0) / 1e9; clear()
        val after = metrics.snap()
        val delta = after.map { case (k, v) => k -> (v - before(k)) }
        tag -> ((t, cw, delta))
      }.toMap
      def m(tag: String): String = {
        val (t, cw, d) = results(tag)
        s""""$tag":${f(t)},"${tag}_canary":${f(cw)},"${tag}_m":{${
          d.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
      }
      val (tn, _, _) = results("narrow")
      val (tw, _, _) = results("wide")
      println(s"""{"probe":"width","query":"$query","sf":"$sfDir"""" +
        s""","w_narrow":$w1,"w_wide":$w2,"round":$round""" +
        s""","order":${order.map(o => "\"" + o._1 + "\"").mkString("[", ",", "]")}""" +
        s""",${m("narrow")},${m("wide")}""" +
        s""","wide_over_narrow":${f(tw / tn)}}""")
    }
    spark.stop()
  }

  /** Per-STAGE wall attribution for one query — the instrument that
    * separates "the work grew" from "the work wouldn't parallelize".
    * Runs the query once (noop sink) and prints one JSON line per stage:
    * task count, stage wall (submission→completion), summed task time,
    * the longest single task, and the implied concurrency
    * (task-time / wall). A stage whose concurrency reads ~1 on a
    * local[32] box is a serial bottleneck regardless of how linearly
    * its work scales — the q124 sf30 campaign found exactly that shape
    * (wall flat across a 3× data step while CPU and shuffle grew
    * linearly, i.e. wall was bound by the least-parallel stage, not by
    * the work). */
  private def stagesOf(queryName: String, sfDir: String): Unit = {
    val spark = session("graft-stageprobe", Map.empty)
    final case class St(name: String, tasks: Int, wallMs: Long,
                        taskMs: Long, maxTaskMs: Long, inMb: Long, shwMb: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    // longest single task per stage, fed by onTaskEnd (stage-level
    // TaskMetrics only carries sums) — the number that says whether a
    // stage's wall is one straggler or uniform depth
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null)
          maxTask.merge(te.stageId, te.taskInfo.duration,
            (a, b) => if (a >= b) a else b)
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(0L)
        val tm = si.taskMetrics
        // JSONL-safe stage label: drop anything that could break the
        // line (quotes, backslashes, control chars)
        val safeName = si.name.takeWhile(_ != '\n').take(60)
          .filter(c => c >= ' ' && c != '"' && c != '\\')
        stages.add(St(safeName, si.numTasks,
          wall, tm.executorRunTime,
          Option(maxTask.get(si.stageId)).map(_.longValue).getOrElse(0L),
          tm.inputMetrics.bytesRead / (1 << 20),
          tm.shuffleWriteMetrics.bytesWritten / (1 << 20)))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(queryName)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listener bus drain
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_.taskMs).foreach { s =>
      val conc = if (s.wallMs > 0) s.taskMs.toDouble / s.wallMs else 0.0
      println(f"""{"probe":"stages","query":"$queryName","sf":"$sfDir","stage":"${s.name}","tasks":${s.tasks},"wall_ms":${s.wallMs},"task_ms":${s.taskMs},"max_task_ms":${s.maxTaskMs},"concurrency":$conc%.1f,"in_mb":${s.inMb},"shw_mb":${s.shwMb}}""")
    }
    println(f"""{"probe":"stages","query":"$queryName","sf":"$sfDir","total_wall_s":$wall%.2f,"n_stages":${stages.size}}""")
    spark.stop()
  }

  private def q152Phases(sfDir: String): Unit = {
    val spark = session("graft-q152-phases", Map.empty)
    import graft.core.Tables
    val o = Tables.orders(spark, sfDir)
    val payload = to_json(struct(
      col("o_orderstatus").as("status"),
      struct(col("o_totalprice").as("amount"),
        col("o_orderpriority").as("prio")).as("detail"),
      array(col("o_custkey"), col("o_orderkey")).as("refs")))
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    def m(body: => Unit): Double = { body; median(timed(runs)(body)) } // 1 warmup
    // cumulative prefixes; each consumes its product via an agg so
    // column pruning can't skip the phase under measurement
    val tScan = m(o.agg(count(lit(1)), sum(col("o_totalprice"))).head())
    val tJson = m(o.select(payload.as("p")).agg(sum(length(col("p")))).head())
    // parse_json and variant_get are measured as ONE rung: separating
    // them would need the probe to consume the bare variant, and every
    // consumption of a variant re-serializes it (to_json/cast), biasing
    // the split; the typed variant_get outputs consume as plain scalars
    val tGet = m(o.select(parse_json(payload).as("var"))
      .select(
        variant_get(col("var"), "$.status", "string").as("status"),
        variant_get(col("var"), "$.detail.amount", "double").as("amount"),
        variant_get(col("var"), "$.detail.prio", "string").as("prio"),
        variant_get(col("var"), "$.refs[0]", "bigint").as("custkey"))
      .agg(sum(length(col("status"))), sum(col("amount")),
        sum(length(col("prio"))), sum(col("custkey"))).head())
    val tFull = m(SparkEntry.queries("q152_variant_shred")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    def f(d: Double) = f"$d%.2f"
    println(s"""{"probe":"q152_phases","sf":"$sfDir","runs_per_point":$runs""" +
      s""","scan":${f(tScan)},"to_json":${f(tJson)}""" +
      s""","parse_and_get":${f(tGet)},"full":${f(tFull)}""" +
      s""","deltas":{"to_json":${f(tJson - tScan)}""" +
      s""","parse_and_get":${f(tGet - tJson)},"group_agg":${f(tFull - tGet)}}}""")
    spark.stop()
  }
}
