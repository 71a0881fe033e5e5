package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed quantiles.
  *
  * Spark's `percentile` aggregate buffers every value into one final
  * reducer (a value-count map, merged then sorted in a single task) — at
  * 100 TB that reducer IS the bottleneck (measured: 15 s for one column
  * at sf0.1 where the whole suite averages 0.3 s/query). The scale path
  * for EXACT quantiles is the order-statistics spelling: range-partition
  * sort (distributed, what orderBy already does), global row indices via
  * zipWithIndex (two light passes), and a filter that collects ONLY the
  * 2×|ps| boundary rows to the driver. Interpolation happens driver-side
  * with the standard (n-1)·p convention — bit-identical to
  * `percentile_cont`/`quantile_cont`. */
object Quantiles {

  /** Exact interpolated quantiles of `valueCol` at fractions `ps`.
    * Three bounded jobs: count, sorted index pick, tiny collect. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     ps: Seq[Double]): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"fractions must be in [0,1]: $ps")
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val n = vals.count()
    if (n == 0) return ps.map(_ => Double.NaN)
    val wanted = ps.flatMap { p =>
      val r = p * (n - 1)
      Seq(math.floor(r).toLong, math.ceil(r).toLong)
    }.toSet
    val picked = vals.orderBy(col("v")).rdd.zipWithIndex()
      .filter { case (_, i) => wanted.contains(i) }
      .map { case (row, i) => (i, row.getDouble(0)) }
      .collect().toMap
    ps.map { p =>
      val r = p * (n - 1)
      val lo = picked(math.floor(r).toLong)
      val hi = picked(math.ceil(r).toLong)
      lo + (hi - lo) * (r - math.floor(r))
    }
  }
}
