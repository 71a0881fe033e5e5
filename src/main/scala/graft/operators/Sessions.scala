package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gaps-and-islands spelling of what
  * `streaming/EventsStream.sessionizeStream` does incrementally: a new
  * session starts where the gap to the previous event of the same user
  * exceeds `gapSec`; the session id is the running count of starts.
  *
  * Scale shape: ONE shuffle (partition by user), then two window passes
  * over the same partitioning (Catalyst reuses the exchange — lag and the
  * running sum share partitionBy/orderBy), then the per-session
  * aggregation combines map-side within the same partitions. No
  * driver-side state; a user's events stream through one task. */
object Sessions {

  /** Per-session rows: (user, session_seq, start/end epoch-μs, n_events,
    * total value as exact cents emitted DOUBLE — the repo numeric policy). */
  def batchSessions(df: DataFrame, userCol: String, tsCol: String,
                    valueCol: String, gapSec: Long,
                    tieCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val withGap = df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(col("__us") - lag("__us", 1).over(byUser) > gapSec * 1000000L
          || lag("__us", 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_seq", sum("__new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col(userCol), col("session_seq"))
      .agg(min("__us").as("start_us"), max("__us").as("end_us"),
        count(lit(1)).as("n_events"),
        graft.functions.Numeric.sumExactD(col(valueCol), 2).as("total_value"))
  }
}
