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
}
