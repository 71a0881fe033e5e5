package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Stateful-streaming scale bench — the measurement the batch bench
  * cannot take. `graft.Bench` times a streaming query's WHOLE drain
  * (one AvailableNow batch over the backlog), which is dominated by
  * fixed machinery and says nothing about the quantity that matters on
  * a live 100 TB/day stream: the STEADY-STATE PER-MICRO-BATCH cost as
  * state accumulates, under each state-store provider.
  *
  * Protocol:
  *   - `prepare <srcSfDir> <workDir> <nFiles>`: rewrite the events table
  *     as `nFiles` TIME-RANGE-ORDERED parquet files (repartitionByRange
  *     on ts; file modification times forced into range order, which is
  *     the order FileStreamSource consumes). Each file then becomes one
  *     micro-batch under maxFilesPerTrigger=1, and because batches
  *     arrive in event-time order the watermark advances and state
  *     evicts exactly as on a live stream.
  *   - `run <workDir> <query> <hdfs|rocksdb> [filesPerTrigger]`: run one
  *     stateful query over the prepared directory with the drain
  *     sentinel DISABLED (multi-batch runs advance the watermark
  *     naturally; the sentinel would jump it past end-of-input in batch
  *     1 and mark every later event late) and a listener recording each
  *     micro-batch's StreamingQueryProgress. Prints ONE JSON line:
  *     per-batch trigger ms, steady-state median/p90 (first batch and
  *     empty batches excluded), max state rows/bytes from the state
  *     operator metrics, and the RocksDB SST footprint when applicable.
  *   - `dedup <srcSfDir> <workDir> <nDeliveries>`: the incremental
  *     near-dup dedup ([[graft.operators.Dedup.dedupBatchAgainstIndex]])
  *     driven delivery-by-delivery, timing each delivery as the index
  *     accumulates — the "state" here is the persisted MinHash index,
  *     so the scale question is whether delivery cost stays flat as the
  *     indexed corpus grows.
  *
  * Run one (query, provider) combo per JVM (dev/stream_bench.sh): state
  * store providers keep loaded-store caches per process, and isolation
  * keeps one combo's GC/page-cache churn out of another's timings (the
  * round-6 protocol lesson).
  */
object StreamBench {

  private final case class BatchStat(batchId: Long, inputRows: Long,
                                     triggerMs: Long, addBatchMs: Long,
                                     stateRows: Long, stateBytes: Long,
                                     rocksSstBytes: Long)

  private def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The stateful family under measurement. Names match the oracle
    * queries exercising the same wrappers (SparkEntry), so a number here
    * reads directly against the CORRECTNESS row that pins the semantics. */
  private val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_tumbling" -> ((s, d) => streaming.EventsStream.tumblingCounts(s, d)),
    "q51_sessions" -> ((s, d) => streaming.EventsStream.sessionize(s, d)),
    "q159_dedup" -> ((s, d) => streaming.EventsStream.dedupedEvents(s, d)),
    "q121_hll_window" -> ((s, d) => streaming.EventsStream.windowedHllRegisters(s, d)),
    "q186_histogram" -> ((s, d) => streaming.EventsStream.streamValueHistogram(s, d)),
    "q70_interval_join" -> ((s, d) => streaming.EventsStream.clickPurchaseIntervalJoin(s, d)),
    "q133_outer_join" -> ((s, d) => streaming.EventsStream.clickPurchaseLeftOuterJoin(s, d)),
    "q157_semi_join" -> ((s, d) => streaming.EventsStream.clickPurchaseSemiJoin(s, d)),
    "q160_full_outer_join" -> ((s, d) => streaming.EventsStream.clickPurchaseFullOuterJoin(s, d)))

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("prepare") => prepare(args(1), args(2), args(3).toInt)
    case Some("run")     => run(args(1), args(2), args(3),
      args.lift(4).map(_.toInt).getOrElse(1), args.lift(5).getOrElse("none"))
    case Some("dedup")   => dedupBench(args(1), args(2), args(3).toInt)
    case _ =>
      System.err.println("usage: StreamBench prepare <srcSfDir> <workDir> <nFiles>" +
        " | run <workDir> <query|all> <hdfs|rocksdb> [filesPerTrigger] [tuning]" +
        " | dedup <srcSfDir> <workDir> <nDeliveries>")
      sys.exit(2)
  }

  /** RocksDB tuning presets for the provider-premium sweep (round-9 ask:
    * the 1.1-2.0x per-batch premium over HDFS-backed state was measured
    * at DEFAULT RocksDB settings — these are Spark 4's documented levers
    * for exactly that commit-path cost):
    *   changelog — changelog checkpointing: commits upload a delta log
    *     instead of snapshotting SST files every batch (snapshot cost
    *     moves to a background maintenance thread);
    *   notrack — trackTotalNumberOfRows=false: drops the per-put/delete
    *     row-count bookkeeping (numRowsTotal reads -1 in the metrics —
    *     the price of the lever, which is why it's a preset and not the
    *     default: the state-size evidence tables need that metric);
    *   both — the two combined.
    * Presets compose onto either provider but only move RocksDB paths;
    * "none" keeps the measured-default baseline. */
  private val tunings: Map[String, Map[String, String]] = Map(
    "none" -> Map.empty,
    "changelog" -> Map(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true"),
    "notrack" -> Map(
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false"),
    "both" -> Map(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false"))

  private def prepare(srcDir: String, workDir: String, nFiles: Int): Unit = {
    val spark = session("graft-streambench-prepare")
    val ev = graft.core.Tables.events(spark, srcDir)
    val out = s"$workDir/events.parquet"
    ev.repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode(SaveMode.Overwrite).parquet(out)
    // FileStreamSource consumes oldest-modTime-first: force modification
    // times into part-number order, which repartitionByRange made equal
    // to time-range order — so micro-batches replay the stream in event
    // order and the watermark advances monotonically
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val t0 = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (st, i) =>
      fs.setTimes(st.getPath, t0 + i * 2000L, -1) }
    println(s"""{"prepared":"$out","files":${parts.length},"rows":${spark.read.parquet(out).count()}}""")
    spark.stop()
  }

  private def run(workDir: String, query: String, provider: String,
                  filesPerTrigger: Int, tuning: String): Unit = {
    require(provider == "hdfs" || provider == "rocksdb", s"provider $provider")
    require(tunings.contains(tuning),
      s"unknown tuning $tuning (have: ${tunings.keys.toSeq.sorted.mkString(",")})")
    val names =
      if (query == "all") queries.keys.toSeq.sorted
      else { require(queries.contains(query), s"unknown query $query " +
        s"(have: ${queries.keys.toSeq.sorted.mkString(",")})"); Seq(query) }
    val spark = session(s"graft-streambench-$query-$provider")
    spark.conf.set("spark.graft.streaming.drain", "false")
    spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", filesPerTrigger.toString)
    if (provider == "rocksdb") spark.conf.set("spark.graft.stateStore", "rocksdb")
    tunings(tuning).foreach { case (k, v) => spark.conf.set(k, v) }

    val stats = new java.util.concurrent.ConcurrentLinkedQueue[BatchStat]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        def dur(k: String): Long =
          Option(p.durationMs.get(k)).map(_.longValue()).getOrElse(0L)
        val ops = p.stateOperators
        val rocks = ops.map { op =>
          Option(op.customMetrics.get("rocksdbSstFileSize"))
            .map(_.longValue()).getOrElse(0L) }.sum
        stats.add(BatchStat(p.batchId, p.numInputRows,
          dur("triggerExecution"), dur("addBatch"),
          ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum, rocks))
      }
    }
    spark.streams.addListener(listener)

    names.foreach { name =>
      stats.clear()
      val t0 = System.nanoTime()
      val outRows = queries(name)(spark, workDir).count()
      val totalSec = (System.nanoTime() - t0) / 1e9
      // the listener bus is async — poll until the stat queue stops
      // growing (two consecutive stable 200 ms checks) instead of a
      // fixed sleep, so a loaded machine can't silently truncate the
      // trailing batches out of batch_ms_max / state_rows_max
      var stable = 0
      var lastSize = -1
      var waitedMs = 0
      while (stable < 2 && waitedMs < 15000) {
        Thread.sleep(200); waitedMs += 200
        val sz = stats.size()
        if (sz == lastSize && sz > 0) stable += 1 else stable = 0
        lastSize = sz
      }
      // steady state: batches that actually carried input, minus the
      // first (store instantiation + code paths warm there)
      import scala.jdk.CollectionConverters._
      val all = stats.asScala.toSeq.sortBy(_.batchId)
      val fed = all.filter(_.inputRows > 0)
      val steady = if (fed.size > 1) fed.tail else fed
      def pct(xs: Seq[Long], q: Double): Long =
        if (xs.isEmpty) -1L
        else xs.sorted.apply(math.min(xs.size - 1, (q * xs.size).toInt))
      val line =
        s"""{"stream_query":"$name","provider":"$provider","tuning":"$tuning"""" +
        s""","files_per_trigger":$filesPerTrigger,"batches":${all.size}""" +
        s""","fed_batches":${fed.size},"input_rows":${all.map(_.inputRows).sum}""" +
        s""","output_rows":$outRows,"total_sec":${f"$totalSec%.2f"}""" +
        s""","batch_ms_median":${pct(steady.map(_.triggerMs), 0.5)}""" +
        s""","batch_ms_p90":${pct(steady.map(_.triggerMs), 0.9)}""" +
        s""","batch_ms_max":${if (steady.isEmpty) -1 else steady.map(_.triggerMs).max}""" +
        s""","add_batch_ms_median":${pct(steady.map(_.addBatchMs), 0.5)}""" +
        s""","state_rows_max":${if (all.isEmpty) 0 else all.map(_.stateRows).max}""" +
        s""","state_bytes_max":${if (all.isEmpty) 0 else all.map(_.stateBytes).max}""" +
        s""","rocks_sst_bytes_max":${if (all.isEmpty) 0 else all.map(_.rocksSstBytes).max}""" +
        s""","per_batch_ms":${all.map(_.triggerMs).mkString("[", ",", "]")}""" +
        s""","per_batch_state_rows":${all.map(_.stateRows).mkString("[", ",", "]")}}"""
      println(line)
    }
    spark.stop()
  }

  /** Incremental dedup as a sequence of deliveries: split documents into
    * `nDeliveries` disjoint batches (stable doc_id hash), run each
    * through the crash-safe delivery protocol, and time every delivery
    * as the persisted index grows — flat per-delivery cost is the claim
    * under test (the index join is band-bucketed, never all-pairs). */
  private def dedupBench(srcDir: String, workDir: String, nDeliveries: Int): Unit = {
    val spark = session("graft-streambench-dedup")
    import graft.operators.Dedup
    val docs = graft.core.Tables.documents(spark, srcDir)
      .select("doc_id", "text")
    val outPath = s"$workDir/dedup_out"
    val idxPath = s"$workDir/dedup_index"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(workDir), spark.sparkContext.hadoopConfiguration)
    Seq(outPath, idxPath).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val lines = (0 until nDeliveries).map { i =>
      val batch = docs.where(pmod(col("doc_id"), lit(nDeliveries.toLong)) === i)
      val t0 = System.nanoTime()
      Dedup.dedupBatchAgainstIndex(batch, "doc_id", "text", outPath, idxPath)
      val sec = (System.nanoTime() - t0) / 1e9
      val idxRows = try spark.read.parquet(idxPath).count() catch {
        case _: org.apache.spark.sql.AnalysisException => 0L }
      s"""{"delivery":$i,"sec":${f"$sec%.2f"},"index_rows":$idxRows}"""
    }
    println(s"""{"stream_query":"q140_incremental_dedup_deliveries","deliveries":[${lines.mkString(",")}]}""")
    spark.stop()
  }
}
