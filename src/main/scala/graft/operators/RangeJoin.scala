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

  /** Backward as-of join (the trades-to-quotes / metrics-to-deployments
    * shape): each left row picks the single MOST RECENT right row of the
    * same key with `right.time <= left.time` — equality matches — and is
    * null-extended when none exists, or when the match is older than
    * `toleranceUs` (checking tolerance after picking the most recent is
    * equivalent to picking within tolerance: any other candidate is older
    * still). Right payload columns emit under `rightPrefix`.
    *
    * Scale shape: the naive spelling is a non-equi join Spark plans as
    * BroadcastNestedLoopJoin. This is instead ONE exchange — both sides
    * hash-partition on the key, the window scans each key's time-merged
    * sequence linearly carrying one last-seen right row. At equal
    * timestamps right rows order before left rows (so equality matches);
    * several right rows on the SAME (key, time) resolve to an unspecified
    * winner — pre-dedup the right side when that pair isn't unique.
    * Time columns may be timestamps (compared as unix micros) or any
    * integral type (compared as-is; `toleranceUs` is then in the same
    * unit). */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       toleranceUs: Option[Long] = None,
                       rightPrefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    require(keys.nonEmpty, "asofJoinBackward needs at least one key column")
    def timeUs(df: DataFrame, c: String) = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType))
      case LongType | IntegerType | ShortType | ByteType => col(c).cast("long")
      case other => throw new IllegalArgumentException(
        s"asofJoinBackward: time column $c has unsupported type $other")
    }
    val lSide = left.select(keys.map(col) ++ Seq(
      timeUs(left, leftTime).as("__t"), lit(1).as("__is_l"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(right.schema).as("__r")): _*)
    val rSide = right.select(keys.map(col) ++ Seq(
      timeUs(right, rightTime).as("__t"), lit(0).as("__is_l"),
      lit(null).cast(left.schema).as("__l"),
      struct(right.columns.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__mt",
        last(when(col("__is_l") === 0, col("__t")), ignoreNulls = true).over(w))
      .where(col("__is_l") === 1)
    val inTol = toleranceUs match {
      case Some(tol) => col("__mt").isNotNull && col("__mt") >= col("__t") - tol
      case None      => col("__mt").isNotNull
    }
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = right.columns.map(c =>
      when(inTol, col("__m").getField(c)).as(s"$rightPrefix$c"))
    matched.select(leftCols ++ rightCols: _*)
  }

  /** Nearest as-of join: each left row picks the single right row of the
    * same key CLOSEST in time — either direction — null-extended when no
    * candidate lies within `toleranceUs` (None = unbounded). Ties in
    * distance go to the backward (earlier-or-equal) candidate, so an
    * exact-timestamp match always wins.
    *
    * Same single-exchange shape as [[asofJoinBackward]]: union both
    * sides, hash-partition on the key, and resolve BOTH directional
    * candidates in one window pass — `last` over the preceding frame for
    * the backward pick, `first` over the following frame for the forward
    * pick — then take the nearer. No join operator at all, so no
    * BroadcastNestedLoopJoin risk and the exchange carries each row once.
    * Several right rows on the same (key, time) resolve to an unspecified
    * winner — pre-dedup the right side when that pair isn't unique. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      toleranceUs: Option[Long] = None,
                      rightPrefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    require(keys.nonEmpty, "asofJoinNearest needs at least one key column")
    def timeUs(df: DataFrame, c: String) = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType))
      case LongType | IntegerType | ShortType | ByteType => col(c).cast("long")
      case other => throw new IllegalArgumentException(
        s"asofJoinNearest: time column $c has unsupported type $other")
    }
    val lSide = left.select(keys.map(col) ++ Seq(
      timeUs(left, leftTime).as("__t"), lit(1).as("__is_l"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(right.schema).as("__r")): _*)
    val rSide = right.select(keys.map(col) ++ Seq(
      timeUs(right, rightTime).as("__t"), lit(0).as("__is_l"),
      lit(null).cast(left.schema).as("__l"),
      struct(right.columns.map(col): _*).as("__r")): _*)
    // Right rows at equal __t sort before left rows, so an exact-time
    // right row lands in the backward frame (equality matches backward,
    // distance 0 — it wins regardless of direction).
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val isR = col("__is_l") === 0
    val matched = lSide.unionByName(rSide)
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__mbt",
        last(when(isR, col("__t")), ignoreNulls = true).over(wb))
      .withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wf))
      .withColumn("__mft",
        first(when(isR, col("__t")), ignoreNulls = true).over(wf))
      .where(col("__is_l") === 1)
    val distB = col("__t") - col("__mbt")   // >= 0; null when no backward
    val distF = col("__mft") - col("__t")   // >= 0; null when no forward
    val inTol: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      dist => toleranceUs match {
        case Some(tol) => dist.isNotNull && dist <= tol
        case None      => dist.isNotNull
      }
    val bOk = inTol(distB)
    val fOk = inTol(distF)
    // backward wins ties (distB <= distF), and wins outright when forward
    // is absent/out-of-tolerance
    val useB = bOk && (!fOk || distB <= distF)
    val pick  = when(useB, col("__mb")).when(fOk, col("__mf"))
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = right.columns.map(c =>
      pick.getField(c).as(s"$rightPrefix$c"))
    matched.select(leftCols ++ rightCols: _*)
  }
}
