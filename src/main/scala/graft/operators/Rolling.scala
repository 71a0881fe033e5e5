package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-window statistics over ordered per-key streams — the batch
  * anomaly-detection shape (z-score of each value against its own
  * trailing window).
  *
  * Numeric policy: window sums run over exact scaled integers (cents),
  * variance/z derive from those sums with plain IEEE ops — the result is
  * bit-reproducible across engines regardless of the window's internal
  * accumulation order, which a naive double `avg`/`stddev` over a moving
  * frame is NOT (incremental vs recomputed accumulation round
  * differently). */
object Rolling {

  /** Rows whose value deviates from the trailing-window mean by more than
    * `zCut` standard deviations. The window is the previous `frame`-1 rows
    * plus the current row, per key, in (orderCol, tieCol) order; rows with
    * fewer than `minN` window rows are never flagged (cold start).
    * One shuffle (partition by key); both window sums share the exchange.
    * Emits (key, tie, value, z) for flagged rows, z rounded to 4dp. */
  def zScoreOutliers(df: DataFrame, keyCol: String, orderCol: String,
                     tieCol: String, valueCol: String,
                     frame: Int, minN: Int, zCut: Double): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-(frame - 1), Window.currentRow)
    val cents = round(col(valueCol) * 100).cast("long")
    val s1 = sum(cents).over(w).cast("double")
    val s2 = sum(cents * cents).over(w).cast("double")
    val n = count(lit(1)).over(w).cast("double")
    val varC = (s2 - s1 * s1 / n) / (n - 1)
    val z = round((cents.cast("double") - s1 / n) /
      sqrt(greatest(varC, lit(1e-12))), 4)
    df.withColumn("__n", n).withColumn("__var", varC).withColumn("z", z)
      .where(col("__n") >= minN && col("__var") > 0 && abs(col("z")) > zCut)
      .select(col(keyCol), col(tieCol), col(valueCol), col("z"))
  }

  /** Exponentially time-decayed engagement score per key:
    * Σ value · 2^(−age/halfLife), age measured back from a shared
    * reference instant (the corpus max timestamp — one scalar, computed
    * once and broadcast) — the recency-weighted activity feature
    * freshness-ranked sampling and user-level features want, without a
    * sliding-window recompute per day.
    *
    * Determinism policy: each row's weight quantizes to 6 dp BEFORE the
    * multiply (absorbing any cross-engine exp/pow last-ulp wobble, the
    * same reasoning as the LM-score families' shared-ln contract), the
    * per-key fold runs over (tieCol-sorted) collected terms, and values
    * are exact cents — so the per-key sums are bit-reproducible.
    *
    * Scale shape: one scalar aggregation for the reference instant; one
    * exchange by key for the fold. The collect_list per key holds that
    * key's OWN events only (user-bounded, the q82-sessions state
    * assumption); keys with millions of events would switch to the
    * two-level fold (partial sorted folds per partition, merge by
    * range) — flagged, not needed at current key widths. */
  def timeDecayScore(df: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, valueCol: String,
                     halfLifeDays: Double): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val ref = df.agg(max(unix_timestamp(col(tsCol))).as("__ref"))
    val ageDays = (col("__ref") - unix_timestamp(col(tsCol))).cast("double") /
      lit(86400.0)
    val w = round(pow(lit(0.5), ageDays / lit(halfLifeDays)), 6)
    df.crossJoin(broadcast(ref))
      .select(col(keyCol), col(tieCol),
        (cents.cast("double") * w).as("__term"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col(tieCol).as("t"),
          col("__term").as("v")))).as("__cs"))
      .select(col(keyCol), col("n_events"),
        round(aggregate(col("__cs"), lit(0.0),
          (acc, x) => acc + x.getField("v")) / 100.0, 4).as("decay_score"))
  }
}
