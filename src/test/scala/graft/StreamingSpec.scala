package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.core.Tables

class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts equal the batch equivalent") {
    val streamed = EventsStream.tumblingCounts(spark, sfDir, 300)
      .orderBy("win_start", "event_type").collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy((floor(unix_timestamp(col("ts")) / 300) * 300).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Numeric.sumExactD(col("value"), 2).as("total_value"))
      .orderBy("win_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("streaming fixed-bin histogram equals the batch histogram exactly") {
    val streamed = EventsStream.streamValueHistogram(spark, sfDir,
        windowSec = 600, lo = 0.0, hi = 500.0, bins = 50)
      .orderBy("win_start", "event_type", "bin").collect()
    val batch = Tables.events(spark, sfDir)
      .where(col("value").isNotNull)
      .groupBy((floor(unix_timestamp(col("ts")) / 600) * 600).as("win_start"),
        col("event_type"),
        least(greatest(floor(col("value") / 10.0), lit(0.0)), lit(49.0))
          .cast("int").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("win_start", "event_type", "bin").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("streaming windowed HLL registers equal the batch sketch exactly") {
    val streamed = EventsStream.windowedHllRegisters(spark, sfDir, 3600)
      .orderBy("win_start", "event_type", "idx").collect()
    val batch = graft.operators.Sketches.hllRegisters(
        Tables.events(spark, sfDir)
          .withColumn("win_start",
            (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long")),
        Seq("win_start", "event_type"), "user_id")
      .orderBy("win_start", "event_type", "idx").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("stream-static enrichment equals the batch join+agg") {
    import spark.implicits._
    val dim = Seq(("view", "engagement", 1L), ("click", "engagement", 3L),
      ("purchase", "revenue", 10L), ("signup", "growth", 5L),
      ("error", "ops", 0L)).toDF("event_type", "category", "weight")
    val streamed = EventsStream.enrichedWindowTotals(spark, sfDir, dim, 600)
      .orderBy("win_start", "category", "event_type").collect()
    val batch = Tables.events(spark, sfDir)
      .join(broadcast(dim), Seq("event_type"), "left")
      .groupBy((floor(unix_timestamp(col("ts")) / 600) * 600).as("win_start"),
        coalesce(col("category"), lit("unknown")).as("category"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Numeric.sumExactD(col("value") * col("weight"), 2)
          .as("weighted_value"))
      .orderBy("win_start", "category", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("sliding windows cover each event twice") {
    val slid = EventsStream.slidingCounts(spark, sfDir, 600, 300)
    val total = slid.agg(sum("n")).collect()(0).getLong(0)
    val events = Tables.events(spark, sfDir).count()
    assert(total == 2 * events)
  }

  test("streaming dedup keeps one row per (user, type) within watermark") {
    val deduped = EventsStream.dedupedEvents(spark, sfDir)
    val keys = deduped.select("user_id", "event_type").distinct().count()
    assert(deduped.count() == keys)
  }

  test("rocksdb state store: dedup and sessionization match the default store") {
    // spark.graft.stateStore=rocksdb swaps the on-heap HDFS-backed store
    // for RocksDBStateStoreProvider (state on executor disk — the 100x
    // key-cardinality path). Same plans, same results, byte for byte.
    val dedupDefault = EventsStream.dedupedEvents(spark, sfDir).collect().toSet
    val sessDefault = EventsStream.sessionize(spark, sfDir, 1800).collect().toSet
    spark.conf.set("spark.graft.stateStore", "rocksdb")
    try {
      val dedupRocks = EventsStream.dedupedEvents(spark, sfDir).collect().toSet
      assert(dedupRocks.nonEmpty && dedupRocks == dedupDefault)
      val sessRocks = EventsStream.sessionize(spark, sfDir, 1800).collect().toSet
      assert(sessRocks.nonEmpty && sessRocks == sessDefault)
    } finally spark.conf.unset("spark.graft.stateStore")
    // the provider conf never leaks into the session after the run
    // (getOption surfaces the session DEFAULT, so assert "not rocksdb")
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }

  test("streaming upsert is idempotent by event_id") {
    val target = java.nio.file.Files.createTempDirectory("graft_su").toString + "/t"
    EventsStream.streamingUpsert(spark, sfDir, target)
    val n1 = spark.read.parquet(target).count()
    // replay the whole stream — the MERGE must not duplicate anything
    EventsStream.streamingUpsert(spark, sfDir, target)
    val n2 = spark.read.parquet(target).count()
    assert(n1 == n2 && n1 == Tables.events(spark, sfDir).count())
  }

  test("sessionization conserves events and respects the gap") {
    val sessions = EventsStream.sessionize(spark, sfDir, 1800)
    val nEvents = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(nEvents == Tables.events(spark, sfDir).count())
    assert(sessions.where(col("n_events") <= 0).count() == 0)
  }

  test("streaming upsert rewrites only the affected date partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft_su2").toString
    val target = s"$base/t"
    EventsStream.streamingUpsert(spark, sfDir, target)
    def partFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(target)
      root.listFiles().filter(_.getName.startsWith("event_date=")).map { d =>
        d.getName -> d.listFiles().map(_.getName).toSet
      }.toMap
    }
    val before = partFiles()
    assert(before.size > 1, "need several date partitions for this test")
    // second input: only the earliest day's events, as a single
    // events.parquet file (the stream source globs that exact name)
    val raw = Tables.events(spark, sfDir) // schema-adaptive ts
    val minDay = raw.agg(min(expr("unix_seconds(ts) div 86400"))).first().getLong(0)
    val inDir = s"$base/in"
    raw.where(expr("unix_seconds(ts) div 86400") === minDay)
      .coalesce(1).write.parquet(s"$inDir.stage")
    val part = new java.io.File(s"$inDir.stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    new java.io.File(inDir).mkdirs()
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$inDir/events.parquet"))
    EventsStream.streamingUpsert(spark, inDir, target)
    val after = partFiles()
    val minDate = java.time.LocalDate.ofEpochDay(minDay).toString
    // dynamic overwrite: the touched partition gets new file names, every
    // other partition's files are bit-identical (same names, untouched)
    assert(after(s"event_date=$minDate") != before(s"event_date=$minDate"))
    before.filter(_._1 != s"event_date=$minDate").foreach { case (p, files) =>
      assert(after(p) == files, s"partition $p was rewritten")
    }
    // and content is still exactly the full event set
    assert(spark.read.parquet(target).count() ==
      Tables.events(spark, sfDir).count())
  }

  test("late event preceding the open session forms its own session, not a merge") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    val evs = mem.toDF().toDF("user_id", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch")))
      .withWatermark("ts", "10000 seconds") // roomy: late rows not dropped
      .select(col("user_id"), col("epoch"), col("value"), col("ts"))
      .as[EventsStream.Ev]
    val name = s"late_sess_${System.nanoTime()}"
    val q = EventsStream.sessionizeStream(evs, gapSec = 100).toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      mem.addData((1L, 5000L, 1.0), (1L, 5050L, 2.0)) // open session at 5000
      q.processAllAvailable()
      // late event 4000s BEFORE the open session: must close as its own
      // session, not inflate the open one (the vacuous-guard bug)
      mem.addData((1L, 1000L, 7.0))
      q.processAllAvailable()
      mem.addData((1L, 20000L, 1.0)) // gap break: closes the 5000 session
      q.processAllAvailable()
      val rows = spark.table(name)
        .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      assert(rows == Seq((1L, 1000L, 1L, 7.0), (1L, 5000L, 2L, 3.0)))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on a drained run") {
    val streamed = EventsStream.clickPurchaseIntervalJoin(spark, sfDir, 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val batch = e.as("p").filter(col("p.event_type") === "purchase")
      .join(e.as("c").filter(col("c.event_type") === "click"),
        col("c.user_id") === col("p.user_id") &&
          col("c.us") >= col("p.us") - 1800000000L && col("c.us") <= col("p.us"))
      .select(col("p.user_id"), col("p.event_id"), col("c.event_id"),
        col("p.us"), col("c.us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("left-outer interval join: unmatched purchases emit null rows on eviction") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))
    val streamed = EventsStream.clickPurchaseLeftOuterJoin(spark, sfDir, 1800)
      .collect().map(key).toSet
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val batch = e.as("p").filter(col("p.event_type") === "purchase")
      .join(e.as("c").filter(col("c.event_type") === "click"),
        col("c.user_id") === col("p.user_id") &&
          col("c.us") >= col("p.us") - 1800000000L && col("c.us") <= col("p.us"),
        "left_outer")
      .select(col("p.user_id"), col("p.event_id"), col("c.event_id"))
      .collect().map(key).toSet
    assert(streamed == batch)
    // the outer semantics must actually fire: some purchases are unmatched
    assert(streamed.exists(_._3 == Long.MinValue))
    // and the inner matches are a strict subset
    assert(streamed.exists(_._3 != Long.MinValue))
  }

  test("full-outer interval join: both sides' unmatched rows surface") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0),
        if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))
    val streamed = EventsStream.clickPurchaseFullOuterJoin(spark, sfDir, 1800)
      .collect().map(key).toSet
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val batch = e.as("p").filter(col("p.event_type") === "purchase")
      .join(e.as("c").filter(col("c.event_type") === "click"),
        col("c.user_id") === col("p.user_id") &&
          col("c.us") >= col("p.us") - 1800000000L && col("c.us") <= col("p.us"),
        "full_outer")
      .select(coalesce(col("p.user_id"), col("c.user_id")),
        col("p.event_id"), col("c.event_id"))
      .collect().map(key).toSet
    assert(streamed == batch)
    // both outer directions must actually fire
    assert(streamed.exists(_._2 == Long.MinValue), "no unmatched clicks")
    assert(streamed.exists(_._3 == Long.MinValue), "no unmatched purchases")
    assert(streamed.exists(r => r._2 != Long.MinValue && r._3 != Long.MinValue))
  }

  test("per-batch incremental cost measured separately from setup (4-batch run)") {
    // the bench lines for the streaming queries are dominated by
    // AvailableNow setup (planning + state-store init + drain); what a
    // live deployment pays per micro-batch is the per-trigger cost — this
    // pins that the machinery actually runs incrementally and records the
    // split, batch by batch
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val tmp = java.nio.file.Files.createTempDirectory("graft_bt").toString + "/in"
    Tables.events(spark, sfDir) // schema-adaptive ts
      .select("ts", "event_type", "value")
      .repartition(4).write.parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val progress =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.synchronized {
          progress += ((e.progress.batchId, e.progress.numInputRows,
            e.progress.durationMs.getOrDefault("triggerExecution", -1L)))
        }
    }
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
        .withWatermark("ts", "3600 seconds")
        .groupBy(window(col("ts"), "300 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append").format("memory")
        .queryName(s"batch_timing_${System.nanoTime()}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      var waited = 0
      while (progress.synchronized(progress.count(_._2 > 0)) < 4 && waited < 100) {
        Thread.sleep(100); waited += 1
      }
    } finally spark.streams.removeListener(listener)
    val snap = progress.synchronized(progress.toList).sortBy(_._1)
    val dataBatches = snap.filter(_._2 > 0)
    assert(dataBatches.size >= 4, s"expected 4 one-file batches, saw $snap")
    val steady = dataBatches.tail.map(_._3)
    info("per-batch ms (batchId, rows, triggerExecution): " + snap.mkString(", "))
    info(s"setup+first batch ${dataBatches.head._3} ms; steady-state median " +
      s"${steady.sorted.apply(steady.size / 2)} ms")
    assert(steady.forall(_ >= 0))
  }

  test("drain-off multi-batch run equals the single-drain run on every " +
    "watermark-closed window; trailing windows stay unemitted") {
    // the drain=false + maxFilesPerTrigger mode rewires the sentinel
    // union every streaming oracle query flows through — this pins that
    // on time-ordered files the multi-batch run's emitted rows are
    // EXACTLY the single-drain run's rows restricted to windows the
    // natural watermark closed (a prefix by win_start), nothing altered
    val base = java.nio.file.Files.createTempDirectory("graft_drainoff").toString
    val out = s"$base/events.parquet"
    Tables.events(spark, sfDir).repartitionByRange(5, col("ts"))
      .sortWithinPartitions("ts").write.parquet(out)
    // FileStreamSource consumes oldest-modTime-first: force mtimes into
    // part order = time-range order (the StreamBench prepare protocol)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val t0 = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1))
    val drained = EventsStream.tumblingCounts(spark, base, 300).collect()
      .map(r => key(r) -> r).toMap
    val partial =
      try {
        spark.conf.set("spark.graft.streaming.drain", "false")
        spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
        EventsStream.tumblingCounts(spark, base, 300).collect()
          .map(r => key(r) -> r).toMap
      } finally {
        spark.conf.unset("spark.graft.streaming.drain")
        spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
      }
    assert(partial.nonEmpty, "multi-batch run emitted nothing — watermark never advanced")
    assert(partial.size < drained.size,
      "drain-off must withhold the trailing windows the sentinel would close")
    // emitted rows are bit-identical to the drained run's
    partial.foreach { case (k, row) => assert(drained(k) == row, s"row differs at $k") }
    // and form a win_start-prefix of the drained result: every drained
    // window at or before the last emitted one must have been emitted
    val cutoff = partial.keys.map(_._1).max
    drained.keys.filter(_._1 <= cutoff).foreach(k =>
      assert(partial.contains(k), s"window $k closed by the watermark but missing"))
  }

  test("orderBacklogByEventTime repairs an adversarially-shuffled backlog: " +
    "multi-batch replay loses rows before, zero after") {
    // the round-11 ask: ship the backlog-ordering remedy as code. Build a
    // time-range-partitioned backlog, then set modTimes in REVERSE event
    // order — the rsync'd/re-copied accident. A maxFilesPerTrigger replay
    // then advances the watermark off the newest file first and drops
    // earlier files' rows as late, silently. The helper must restore
    // event-time order from the parquet footers alone and make the same
    // replay equal the ordered-backlog reference run.
    val base = java.nio.file.Files.createTempDirectory("graft_backlog").toString
    val out = s"$base/events.parquet"
    Tables.events(spark, sfDir).repartitionByRange(5, col("ts"))
      .sortWithinPartitions("ts").write.parquet(out)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    def shuffleMtimes(): Unit = { // newest event range gets the OLDEST mtime
      val t0 = System.currentTimeMillis() - parts.length * 2000L
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(t0 + (parts.length - 1 - i) * 2000L)
      }
    }
    def run(): Map[(Long, String), org.apache.spark.sql.Row] =
      try {
        spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
        EventsStream.tumblingCounts(spark, base, 300).collect()
          .map(r => (r.getLong(0), r.getString(1)) -> r).toMap
      } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
    // reference: the same multi-batch replay over a correctly-ordered
    // backlog (the drain-off prefix semantics, pinned by the spec above)
    val t0 = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }
    val reference = run()
    shuffleMtimes()
    val lossy = run()
    assert(lossy.size < reference.size,
      "reverse-mtime backlog must lose windows (else the fixture proves nothing)")
    shuffleMtimes() // re-break, then let the HELPER repair it
    val report = EventsStream.orderBacklogByEventTime(spark, out).collect()
    assert(report.length == parts.length)
    // footer keys must have produced ascending min_ts in rank order
    val byRank = report.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("min_ts"))
    assert(byRank.sameElements(byRank.sorted), "ranks must ascend in event time")
    val repaired = run()
    assert(repaired.keySet == reference.keySet,
      s"repaired replay must emit every reference window " +
        s"(missing: ${(reference.keySet -- repaired.keySet).take(5)})")
    repaired.foreach { case (k, row) => assert(reference(k) == row, s"row differs at $k") }
  }

  test("worstOverlap: seed pair excluded — a non-overlapping backlog reads 0, " +
    "not a Long.MinValue underflow") {
    // round-12 ADVICE: the scanLeft seed (Long.MinValue) was zipped into
    // the max, so the first file contributed `Long.MinValue - min_ts`
    // (wraps to ~9.2e18) and the overlap warning fired on EVERY backlog.
    // The advisor's own simulation: ordered, non-overlapping 2-file
    // backlog with positive epoch keys.
    val nonOverlapping = Seq((1700000000L, 1700000999L), (1700001000L, 1700001999L))
    assert(EventsStream.worstOverlap(nonOverlapping) == 0L,
      "adjacent-but-disjoint files must report zero overlap")
    // a real overlap reports its exact magnitude (file 2 starts 250 units
    // before file 1 ends)
    assert(EventsStream.worstOverlap(
      Seq((1000L, 2000L), (1750L, 3000L))) == 250L)
    // multi-file: the worst pair wins (file 1's tail reaches 3000 past
    // file 2's start; the file-2/file-3 pair overlaps only 100)
    assert(EventsStream.worstOverlap(
      Seq((1000L, 5000L), (2000L, 2100L), (4900L, 6000L))) == 3000L)
    // degenerate backlogs: nothing to overlap with
    assert(EventsStream.worstOverlap(Seq((1000L, 2000L))) == 0L)
    assert(EventsStream.worstOverlap(Nil) == 0L)
  }

  test("maxFilesPerTrigger alone implies drain-off; drain=true with it is refused") {
    // the round-10 DEPLOY dry run set ONLY maxFilesPerTrigger (the
    // backlog bullet) and the batch-1 sentinel silently late-dropped
    // half a non-time-ordered backlog — multi-batch mode must imply
    // steady-state, and the one lossy combination must fail loudly
    val base = java.nio.file.Files.createTempDirectory("graft_mbdrain").toString
    val out = s"$base/events.parquet"
    Tables.events(spark, sfDir).repartitionByRange(5, col("ts"))
      .sortWithinPartitions("ts").write.parquet(out)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val t0 = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }
    def run(): Set[(Long, String)] =
      EventsStream.tumblingCounts(spark, base, 300).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val implied =
      try {
        spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
        run()
      } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
    val explicit =
      try {
        spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
        spark.conf.set("spark.graft.streaming.drain", "false")
        run()
      } finally {
        spark.conf.unset("spark.graft.streaming.drain")
        spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
      }
    assert(implied.nonEmpty, "implied drain-off run emitted nothing")
    assert(implied == explicit,
      "maxFilesPerTrigger without a drain conf must behave as drain=false")
    val ex = intercept[IllegalArgumentException] {
      try {
        spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
        spark.conf.set("spark.graft.streaming.drain", "true")
        run()
      } finally {
        spark.conf.unset("spark.graft.streaming.drain")
        spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
      }
    }
    assert(ex.getMessage.contains("late"),
      s"refusal must name the late-drop mechanism, got: ${ex.getMessage}")
  }

  test("streaming incremental dedup accumulates the index across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sid").toString
    val (out, idx) = (s"$base/out", s"$base/idx")
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = graft.operators.Dedup.streamingIncrementalDedup(docs, "doc_id",
      "text", out, idx, n = 3, k = 16, bands = 4, threshold = 0.5,
      availableNow = false)
    try {
      val textA = "the quick brown fox jumps over the lazy dog again and again"
      val fresh = "fresh unique eleven alpha beta gamma delta epsilon zeta eta"
      mem.addData((1L, textA),
        (2L, "completely different content about spark execution engines at scale"))
      q.processAllAvailable()
      mem.addData((3L, textA + " tail"), // near-dup of batch-1 doc 1: dropped
        (4L, fresh))                     // genuinely new: kept
      q.processAllAvailable()
      mem.addData((5L, fresh))           // dup of doc 4 from an EARLIER batch
      q.processAllAvailable()            // (whole batch drops: no writes at all)
      val kept = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L))
      // the index accumulated exactly the survivors, 4 band rows each
      val indexed = spark.read.parquet(idx)
      assert(indexed.select("id").distinct().as[Long].collect().toSet ==
        Set(1L, 2L, 4L))
      assert(indexed.count() == 3 * 4)
      // replay convergence: re-running a batch already absorbed must not
      // duplicate output rows or change the kept set (the crash contract)
      graft.operators.Dedup.dedupBatchAgainstIndex(
        Seq((4L, fresh)).toDF("doc_id", "text"), "doc_id", "text", out, idx,
        n = 3, k = 16, bands = 4, threshold = 0.5)
      assert(spark.read.parquet(out).count() == 3)
    } finally q.stop()
  }

  test("incremental sessionization emits each closed session exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    val evs = mem.toDF().toDF("user_id", "epoch", "value")
      .withColumn("ts", timestamp_seconds(col("epoch")))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("epoch"), col("value"), col("ts"))
      .as[EventsStream.Ev]
    val name = s"inc_sess_${System.nanoTime()}"
    val q = EventsStream.sessionizeStream(evs, gapSec = 100).toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      mem.addData((1L, 1000L, 1.0), (1L, 1050L, 2.0)) // open session A
      q.processAllAvailable()
      mem.addData((1L, 3000L, 3.0)) // gap break: closes A, opens B
      q.processAllAvailable()
      mem.addData((2L, 10000L, 9.9)) // watermark pusher: times out B
      q.processAllAvailable()
      q.processAllAvailable() // drain the timeout-only batch
      val rows = spark.table(name)
        .as[(Long, Long, Long, Double)].collect().toSeq
      val user1 = rows.filter(_._1 == 1L)
      // exactly two sessions, each exactly once, no open-session flushes
      assert(user1.sorted == Seq((1L, 1000L, 2L, 3.0), (1L, 3000L, 1L, 3.0)))
      // user 2's session is still open: never emitted early
      assert(!rows.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("streaming CDC apply: order-shuffled batch split lands on the batch compaction") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val inDir = s"$base/in"
    new java.io.File(inDir).mkdirs()
    // the full changelog; 'error' tombstones; versions = (ts, event_id)
    val all = Seq(
      (1L, 10L, 100L, "view", 1.0), (2L, 10L, 200L, "purchase", 5.0),
      (3L, 10L, 300L, "view", 2.0), (4L, 10L, 400L, "purchase", 7.0),
      (1L, 10L, 150L, "purchase", 9.0), // newer same-ts: event_id decides
      (2L, 10L, 250L, "error", 0.0),    // tombstone (newest for user 2)
      (3L, 10L, 120L, "error", 0.0),    // tombstone OLDER than 300: loses
      (4L, 10L, 500L, "click", 3.0))
    // adversarial split: the file carrying user 2's tombstone and user
    // 1's newest row lands in a DIFFERENT batch than their other rows,
    // and file names reverse the natural order
    def write(name: String, rows: Seq[(Long, Long, Long, String, Double)]): Unit =
      rows.toDF("user_id", "day", "event_id", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("day") * 86400000000L +
          col("event_id") * 1000000L))
        .drop("day").coalesce(1).write.mode("overwrite")
        .parquet(s"$base/stage_$name")
    def install(name: String): Unit = {
      val part = new java.io.File(s"$base/stage_$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$inDir/events_$name.parquet"))
    }
    write("z_first", all.filter(t => t._3 >= 250))
    write("a_second", all.filter(t => t._3 < 250))
    install("z_first"); install("a_second")
    val target = s"$base/snap"
    EventsStream.streamCdcApply(spark, inDir, target, maxFilesPerTrigger = 1)
    val live = spark.read.parquet(target).where(!col("__deleted"))
      .select("user_id", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // batch compaction ground truth: latest per user, tombstones erase
    assert(live == Set((1L, 150L, "purchase"), (3L, 300L, "view"),
      (4L, 500L, "click")))
    // user 2 survives only as a ghost
    val ghosts = spark.read.parquet(target).where(col("__deleted"))
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(ghosts == Set(2L))
    // re-running the whole stream over the same input is a no-op
    // (fresh checkpoint, same files → same snapshot)
    EventsStream.streamCdcApply(spark, inDir, target, maxFilesPerTrigger = 1)
    val live2 = spark.read.parquet(target).where(!col("__deleted"))
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live2 == Set((1L, 150L), (3L, 300L), (4L, 500L)))
  }
}
