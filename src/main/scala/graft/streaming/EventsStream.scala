package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming pipelines over the `events` table (north-star
  * extension — the reference is batch-only, SURVEY.md §2.8; the importer
  * shape S10→F6→K4 maps to readStream → normalize → sink).
  *
  * Local runs drive a parquet directory through a memory sink with
  * AvailableNow, which processes the backlog exactly like a live stream
  * (same incremental planner, same state store); on a cluster the same
  * code tails an arriving directory/Kafka topic. */
object EventsStream {

  /** Tumbling-window counts per event_type. Watermark bounds state: at
    * 100 TB/day the state store only keeps windows newer than the watermark
    * horizon, so state is O(active windows), not O(history). */
  def tumblingCounts(spark: SparkSession, dir: String,
                     windowSec: Int = 300): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Streaming needs an explicit schema; take it from a batch peek
    // (ts arrives as raw nanos long under nanosAsLong).
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-stream sources need a directory; narrow to the events file(s)
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val events = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$windowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Numeric.sumExactD(col("value"), 2).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("total_value"))

    val name = s"events_stream_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def eventsStream(spark: SparkSession, dir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def runToTable(df: DataFrame, mode: String): DataFrame = {
    val name = s"events_stream_${System.nanoTime()}"
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Sliding windows (overlapping) — each event lands in window/slide
    * buckets; watermark bounds state exactly as in the tumbling case. */
  def slidingCounts(spark: SparkSession, dir: String,
                    windowSec: Int = 600, slideSec: Int = 300): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$windowSec seconds", s"$slideSec seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"))
    runToTable(agg, "complete")
  }

  /** Streaming exact dedup within the watermark horizon — the streaming
    * spelling of U2 (state store keeps one entry per key until the
    * watermark passes; unbounded-history dedup at 100 TB is a non-goal by
    * design). */
  def dedupedEvents(spark: SparkSession, dir: String): DataFrame = {
    val deduped = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("event_id"), col("user_id"), col("event_type"))
    runToTable(deduped, "append")
  }

  /** The reference's import loop (S10 → F6 → K4) in streaming form:
    * readStream → validate → foreachBatch MERGE into a parquet table keyed
    * by event_id. Each micro-batch upserts idempotently — replaying a batch
    * (at-least-once delivery) cannot duplicate rows, which is the
    * exactly-once-by-key contract the reference's updateOrCreate gives. */
  def streamingUpsert(spark: SparkSession, dir: String, targetPath: String): Unit = {
    import graft.operators.Merge
    val events = eventsStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val q = events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val existing =
          try spark.read.parquet(targetPath)
          catch { case _: Throwable => batch.sparkSession.emptyDataFrame }
        val merged =
          if (existing.isEmpty) batch.toDF()
          else Merge.upsert(existing, batch.toDF(), Seq("event_id"))
        // write to a temp dir then swap — plain parquet has no transactional
        // MERGE; at scale this is a partition-scoped rewrite (Sinks)
        val tmp = targetPath + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(targetPath)
        fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stateful sessionization: per-user session = events with < `gapSec`
    * between them (flatMapGroupsWithState with event-time timeout — custom
    * state beyond built-in windows, the KeyValueGroupedDataset path). */
  final case class SessionRow(user_id: Long, session_start_epoch: Long,
                              n_events: Long, total_value: Double)
  final case class Ev(user_id: Long, epoch: Long, value: Double)
  final case class SessState(start: Long, last: Long, n: Long, total: Double)

  def sessionize(spark: SparkSession, dir: String, gapSec: Int = 1800): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val evs = eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), unix_timestamp(col("ts")).as("epoch"), col("value"))
      .as[Ev]

    val sessions = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[List[SessState]]) =>
          // AvailableNow drains the whole backlog in one group call; emit
          // every closed session, keep the open one in state.
          val sorted = it.toSeq.sortBy(e => (e.epoch, e.value))
          var open = state.getOption.flatMap(_.headOption)
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.epoch - s.last <= gapSec =>
                open = Some(s.copy(last = e.epoch, n = s.n + 1, total = s.total + e.value))
              case Some(s) =>
                closed += SessionRow(user, s.start, s.n, s.total)
                open = Some(SessState(e.epoch, e.epoch, 1, e.value))
              case None =>
                open = Some(SessState(e.epoch, e.epoch, 1, e.value))
            }
          }
          open.foreach(s => state.update(List(s)))
          // flush the trailing open session too — AvailableNow ends input
          val tail = open.map(s => SessionRow(user, s.start, s.n, s.total))
          (closed ++ tail).iterator
      }
    runToTable(sessions.toDF(), "append")
  }
}
