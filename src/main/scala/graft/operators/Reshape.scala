package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reshaping operators: melt (wide year-matrix → long), pivot back to wide,
  * forward-fill, group-into-list (SURVEY.md §1.1, §2.4 A3/A4, §2.5 W1/W2).
  *
  * The reference's DBD financial pipeline is melt → item map → pivot
  * (script_read_dbd_income.py:281-385, ImportDbdFinancial.php:185-288). */
object Reshape {

  /** Melt `valueCols` into (keyName, valName) long form, keeping `idCols`.
    * Uses Spark's native unpivot (Spark 3.4+) — one narrow pass, no shuffle. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           keyName: String = "key", valName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, keyName, valName)

  /** A3 first-match pivot: one row per id with `payload[key] = value`,
    * last-write-wins per key replicated as `first(value)` over an explicit
    * ordering. `knownKeys` MUST be supplied at scale — an unpivoted key list
    * forces an extra pass to discover distinct keys. */
  def pivotFirst(df: DataFrame, idCols: Seq[String], keyCol: String,
                 valCol: String, knownKeys: Seq[String]): DataFrame =
    df.groupBy(idCols.map(col): _*)
      .pivot(keyCol, knownKeys)
      .agg(first(col(valCol), ignoreNulls = true))

  /** W2 forward-fill down a column within `part`, ordered by `ord`
    * (script_read_dbd_ratios.py:242-243). */
  def ffill(c: Column, part: Seq[Column], ord: Column): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(part: _*).orderBy(ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** A4 group-into-dict: one row per group with the members collected as an
    * array of structs, ordered deterministically by `ord` inside the array
    * (script_read_dbd_income.py:349-385, PublicApiController.php:962-975). */
  def groupToList(df: DataFrame, groupCols: Seq[String], ord: String,
                  payload: Column): DataFrame =
    df.withColumn("__p", struct(col(ord).as("__o"), payload.as("__v")))
      .groupBy(groupCols.map(col): _*)
      .agg(transform(array_sort(collect_list(col("__p"))),
        x => x.getField("__v")).as("items"))

  /** Time-grid resample + forward-fill: snap each key's observations to a
    * regular `stepSec` grid spanning that key's own [min, max] bucket,
    * keep the LAST observation per bucket (ties broken by `tieCol` desc),
    * and forward-fill empty buckets from the previous value. Emits
    * (key, bucket_ts, value, is_observed) — the gap-fill / downsample
    * shape feeding any fixed-cadence model input or dashboard.
    *
    * Scale shape (audited): two map-side-combined aggregation exchanges
    * — per-(key,bucket) for the last-pick, per-key for the span — both
    * carrying aggregates, never raw observations. The ffill window
    * REUSES the span aggregation's key partitioning (the grid explode
    * preserves it), so no third exchange appears for the window; the
    * grid itself is generated, not joined: `sequence()` materializes
    * each key's buckets from two scalars, bounded by span/step — no
    * calendar table, no cross join. */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, tieCol: String,
                    stepSec: Long): DataFrame = {
    require(stepSec > 0, s"step must be positive: $stepSec")
    val step = lit(stepSec)
    val sec = floor(unix_micros(col(tsCol).cast("timestamp")) / lit(1000000L))
      .cast("long")
    val bucket = sec - pmod(sec, step)
    val perBucket = df
      .withColumn("__b", bucket)
      .withColumn("__pick", struct(col(tsCol).as("__t"),
        col(tieCol).as("__tie"), col(valCol).as("__v")))
      .groupBy(col(keyCol), col("__b"))
      .agg(max(col("__pick")).getField("__v").as("__obs"))
    val grids = perBucket.groupBy(col(keyCol))
      .agg(min("__b").as("__lo"), max("__b").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), step)).as("__b"))
    grids.join(perBucket, Seq(keyCol, "__b"), "left")
      .select(col(keyCol), col("__b").as("bucket_ts"),
        ffill(col("__obs"), Seq(col(keyCol)), col("__b")).as("value"),
        col("__obs").isNotNull.as("is_observed"))
  }
}
