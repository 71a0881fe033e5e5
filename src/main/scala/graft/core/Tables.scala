package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; these helpers
  * centralize path handling so a query body reads like SQL. At cluster scale
  * the same code works unchanged — parquet scans are partitioned, and
  * Catalyst pushes filters/projections down to the scan (verify with
  * `df.explain("formatted")`: look for PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has drifted across testdata generations: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects — read as raw nanos via the
    * legacy conf, then truncate to micros) and plain `timestamp[us]` (which
    * Spark reads as TIMESTAMP_NTZ when untagged). Branch on the LOADED
    * schema rather than assuming one shape, so a testdata regeneration
    * fails loudly here — not as 23 downstream analysis errors. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Schema-adaptive `ts` normalization shared by the batch and streaming
    * events loaders. NTZ is cast through the session time zone (UTC in
    * Verify/Bench/tests), which yields the same instant the nanos path
    * produced, keeping query outputs stable across testdata shapes. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other — expected TIMESTAMP(NANOS) " +
          "read as long, TIMESTAMP_NTZ (timestamp[us] untagged), or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
