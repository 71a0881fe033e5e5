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
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("total_value"))
      .orderBy("win_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }
}
