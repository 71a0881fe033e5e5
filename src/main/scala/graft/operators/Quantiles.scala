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

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Contract guard for [[madOutliers]]'s deliberate no-materialize
    * choice: true when the frame's plan BOTH contains expensive
    * derivation (a join, aggregate, window, or generate upstream) AND is
    * not already cached/checkpointed — the case where a multi-consumer
    * operator silently re-runs that derivation once per consumer. A bare
    * (possibly filtered/projected) scan re-reads cheaply under column
    * pruning; an InMemoryRelation or LogicalRDD/LocalRelation leaf
    * (persist / Checkpoints.cut / collected literal) re-reads from
    * materialized rows — neither is flagged. */
  private[graft] def expensiveUncachedInput(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, Window => LWindow}
    // a FRESH QueryExecution, not df.queryExecution: the Dataset memoizes
    // its QueryExecution at first use, so a persist() issued after that
    // would not show up as InMemoryRelation in the stale copy — the
    // guard must see the cache state AS OF THE CALL
    val plan = df.sparkSession.sessionState.executePlan(df.queryExecution.logical)
      .optimizedPlan
    val cached = plan.exists {
      case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => true
      case _ => false
    }
    !cached && plan.exists {
      case _: Join | _: Aggregate | _: LWindow | _: Generate => true
      case _ => false
    }
  }

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
      // quantile_cont's exact operation order: lo·(crn−r) + hi·(r−frn),
      // NOT lo + (hi−lo)·frac — the forms differ by an ulp on some
      // inputs and the oracle compare is bit-exact
      if (math.floor(r) == math.ceil(r)) lo
      else lo * (math.ceil(r) - r) + hi * (r - math.floor(r))
    }
  }

  /** Exact interpolated quantiles PER GROUP, fully distributed: a
    * per-group sort window stamps each value's rank and group size, a
    * filter keeps only the 2×|ps| boundary rows per group, and one
    * aggregation interpolates. No single-reducer value buffer at any
    * group size — the per-group `percentile` aggregate buffers a whole
    * group in its final reducer, which is exactly the q91 pathology when
    * one group dominates. Returns one row per group with one column per
    * requested fraction, named by `names`.
    *
    * NULL semantics: values are filtered before ranking, so a group whose
    * values are ALL null yields NO output row — unlike `percentile_cont`,
    * which would emit the group with NULL quantiles. Callers needing
    * aggregate parity should left-join the group list back. */
  def exactGroupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                          ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.size == names.size,
      s"each fraction needs a name: $ps / $names")
    require(ps.forall(p => p >= 0 && p <= 1), s"fractions must be in [0,1]: $ps")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val wAll = Window.partitionBy(col(groupCol))
    val base = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(wOrd).cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(wAll))
    def rank(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    val isBoundary = ps.map { p =>
      col("__rn") === floor(rank(p)).cast("long") ||
        col("__rn") === ceil(rank(p)).cast("long")
    }.reduce(_ || _)
    val aggs = ps.zip(names).flatMap { case (p, nm) => Seq(
      max(when(col("__rn") === floor(rank(p)).cast("long"), col("__v"))).as(s"__lo_$nm"),
      max(when(col("__rn") === ceil(rank(p)).cast("long"), col("__v"))).as(s"__hi_$nm"))
    } :+ first(col("__n")).as("__gn")
    val g = base.where(isBoundary)
      .groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val outs = ps.zip(names).map { case (p, nm) =>
      val rr = lit(p) * (col("__gn") - 1).cast("double")
      // quantile_cont's operation order (see exactQuantiles)
      when(floor(rr) === ceil(rr), col(s"__lo_$nm"))
        .otherwise(col(s"__lo_$nm") * (ceil(rr) - rr) +
          col(s"__hi_$nm") * (rr - floor(rr)))
        .as(nm)
    }
    g.select(col(groupCol) +: outs: _*)
  }

  /** Robust per-group outlier screen: median + MAD (median absolute
    * deviation), the estimator that survives the contamination that
    * wrecks mean/stddev screens — one fat-finger 1e9 row shifts a
    * z-score gate for the whole group but moves the median not at all.
    * Flags |x − median| > k·1.4826·MAD (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD
    * consistent for the normal σ, so `k` reads like a z-cutoff).
    *
    * Exactness: money quantizes to cents ×2 (HALF-cent units), so the
    * first median — interpolated at worst between adjacent integers —
    * is an exact double; deviations in half-cent units are again exact,
    * and the second median's worst case (quarter-cents) still sits on a
    * double-exact dyadic. The gate compares an exact integer-valued
    * deviation against one correctly-rounded product — deterministic on
    * any IEEE engine. Returns per group: n, median, mad_sigma (scaled
    * MAD in money units), n_out_low, n_out_high.
    *
    * Scale shape: both medians ride [[exactGroupQuantiles]] (per-group
    * sort windows, boundary-rows-only aggregation — no single-reducer
    * value buffer); the group-sized median/MAD tables broadcast back;
    * the data crosses the group-key exchange twice (once per ranking
    * pass) and nothing else. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    // deliberately NOT materialized (the Layout curveQualityMulti
    // lesson): c2 fans out to three consumers, so the source re-scans
    // once per consumer — but each scan prunes to two columns and both
    // alternatives measured WORSE at sf0.1 (lazy 2.45 s, eager
    // Checkpoints.cut +0.44 s, MEMORY_AND_DISK persist slower still):
    // caching 2-column rows costs more than re-reading them from
    // column-pruned parquet. At cluster scale a caller feeding an
    // expensively-derived frame (not a raw table scan) should persist
    // it BEFORE calling — the operator can't tell WHICH re-scan is cheap
    // from inside, but it CAN tell when the input plan carries an
    // uncached join/agg/window, so that case warns loudly instead of
    // silently triple-running the caller's derivation.
    if (expensiveUncachedInput(df))
      log.warn("madOutliers: input is an UNCACHED derived frame (join/" +
        "aggregate/window upstream) and fans out to three internal " +
        "consumers — each consumer will RE-RUN that derivation. " +
        "persist() or Checkpoints.cut the input before calling; the " +
        "lazy-is-cheaper measurement only covers pruned raw-table scans.")
    val c2 = df.select(col(groupCol),
      (round(col(valueCol) * 100).cast("long") * 2).as("c2"))
    val med = exactGroupQuantiles(c2, groupCol, "c2", Seq(0.5), Seq("med2"))
    val dev = c2.join(broadcast(med), groupCol)
      .withColumn("dev2", abs(col("c2").cast("double") - col("med2")))
    val mad = exactGroupQuantiles(dev, groupCol, "dev2", Seq(0.5), Seq("mad2"))
    dev.join(broadcast(mad), groupCol)
      // lit(k)·lit(1.4826)·mad2 left-assoc, NOT a pre-folded Scala
      // constant: an oracle spells the identical double literals and
      // multiply order, so the gate value matches to the last bit
      .withColumn("cut", lit(k) * lit(1.4826) * col("mad2"))
      .groupBy(col(groupCol), col("med2"), col("mad2"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("c2").cast("double") - col("med2") < -col("cut"), 1L)
          .otherwise(0L)).as("n_out_low"),
        sum(when(col("c2").cast("double") - col("med2") > col("cut"), 1L)
          .otherwise(0L)).as("n_out_high"))
      .select(col(groupCol), col("n"),
        round(col("med2") / 200.0, 6).as("median"),
        round(col("mad2") * lit(1.4826) / 200.0, 6).as("mad_sigma"),
        col("n_out_low"), col("n_out_high"))
  }
}
