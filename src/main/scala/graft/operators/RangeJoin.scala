package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: fact rows matched to dimension rows by `lo <= value < hi`.
  *
  * The naive spelling is a non-equi join — Spark plans it as
  * BroadcastNestedLoopJoin (every fact row probes every dim row). Fine for
  * a handful of bands; O(facts × dims) once the dim grows. The scale
  * pattern here turns it into an EQUI-join: quantize the value domain into
  * fixed-width buckets, explode each dim interval to the buckets it
  * overlaps (rows × interval-width/step — bounded, dim-side only), and
  * hash-join fact.bucket = dim.bucket with the exact range predicate left
  * as a residual filter. The fact table keeps one row per row (its value
  * lands in exactly one bucket), so the join is a plain broadcast/shuffle
  * hash join on an integer key — AQE picks the strategy by size.
  */
object RangeJoin {

  /** Equi-join `fact` to interval dim rows via bucket quantization.
    * `step` is the bucket width; intervals are [lo, hi) half-open.
    * Each (fact row, dim row) pair matches at most once: the fact value
    * maps to one bucket and the dim emits each overlapped bucket once. */
  def bucketed(fact: DataFrame, valueCol: String,
               dim: DataFrame, loCol: String, hiCol: String,
               step: Double): DataFrame = {
    require(step > 0, s"bucket step must be positive: $step")
    val dimB = dim.withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / step).cast("long"),
          // hi is exclusive: a dim row ending exactly on a bucket edge
          // does not overlap that bucket, so its last bucket is
          // ceil(hi/step) - 1 (exact — no epsilon arithmetic)
          greatest(ceil(col(hiCol) / step).cast("long") - 1,
            floor(col(loCol) / step).cast("long")))))
    val factB = fact.withColumn("__bucket",
      floor(col(valueCol) / step).cast("long"))
    factB.join(dimB, Seq("__bucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  private def bucketSpan(lo: org.apache.spark.sql.Column,
                         hi: org.apache.spark.sql.Column, step: Double) =
    explode(sequence(
      floor(lo / step).cast("long"),
      greatest(ceil(hi / step).cast("long") - 1, floor(lo / step).cast("long"))))

  /** Interval × interval overlap join (half-open: overlap iff
    * aLo < bHi && bLo < aHi) as an equi-join: both sides explode to the
    * buckets they span, pairs hash-join on the bucket, and the residual
    * keeps exact overlaps. A pair overlapping several buckets would match
    * once per shared bucket — the first-overlap-bucket condition
    * (`bucket == floor(max(aLo,bLo)/step)`) keeps each pair EXACTLY once
    * without a dedup shuffle. Shuffle volume is rows × spanned-buckets
    * per side; pick `step` near the typical interval length. */
  def intervalOverlapJoin(a: DataFrame, aLo: String, aHi: String,
                          b: DataFrame, bLo: String, bHi: String,
                          step: Double): DataFrame = {
    require(step > 0, s"bucket step must be positive: $step")
    val aB = a.withColumn("__bucket", bucketSpan(col(aLo), col(aHi), step))
    val bB = b.withColumn("__bucket", bucketSpan(col(bLo), col(bHi), step))
    aB.join(bB, Seq("__bucket"))
      .where(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col("__bucket") === floor(greatest(col(aLo), col(bLo)) / step).cast("long"))
      .drop("__bucket")
  }
}
