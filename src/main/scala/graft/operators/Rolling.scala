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
}
