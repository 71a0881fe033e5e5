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
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("total_value"))
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
}
