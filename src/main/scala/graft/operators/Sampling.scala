package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every id maps
  * to a stable bucket, buckets map to named splits by cumulative
  * fraction. Properties a training split needs that `randomSplit` lacks:
  * rerun-stable (no RNG, no partition-order dependence), append-stable
  * (new rows never reassign existing ids), and join-free (a pure
  * projection at any scale). */
object Sampling {

  /** Bucket id in [0, buckets) via xxhash64 of the id — the default,
    * well-mixed choice. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(xxhash64(id), lit(buckets)).cast("int")

  /** Bucket id via Knuth multiplicative hashing (golden-ratio constant,
    * TAOCP §6.4) — arithmetic-only, so the SAME bucket is computable in
    * any SQL engine (the cross-engine-checkable variant). The id is first
    * reduced mod 2^31 so the multiply stays below Long.MaxValue: Spark
    * would silently wrap on overflow while ANSI engines (DuckDB's BIGINT)
    * raise — the reduction keeps both engines on the same arithmetic for
    * ANY id, including ids >= 2^32 and negatives. The power-of-two mods
    * are spelled as bitmasks (`x & (2^k - 1)` == non-negative mod 2^k for
    * any two's-complement long), which computes the identical value in
    * one AND instead of pmod's two mods + add; the masked product is
    * non-negative, so the final bucket mod is a plain `%`. */
  def multiplicativeBucket(id: Column, buckets: Int): Column =
    ((id.cast("long").bitwiseAND(lit(2147483647L)) * lit(2654435761L))
      .bitwiseAND(lit(4294967295L)) % lit(buckets.toLong))
      .cast("int")

  /** Map a bucket column to split names by cumulative fractions, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`. Fractions must
    * sum to ~1; the last split absorbs rounding. */
  def splitColumn(bucket: Column, buckets: Int,
                  splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * buckets).toInt)
    splits.init.zip(cuts.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cut), els) =>
        when(bucket < cut, lit(name)).otherwise(els)
      }
  }

  /** Adds a `split` column assigning each row by hash of `idCol`. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)], buckets: Int = 1000): DataFrame =
    df.withColumn("split",
      splitColumn(hashBucket(col(idCol), buckets), buckets, splits))

  /** Deterministic unit-interval hash of the id — the coin for weighted
    * sampling, spelled with the engine-portable multiplicative hash so an
    * independent engine recomputes the identical value. */
  def hashUnit(id: Column, buckets: Int = 1 << 20): Column =
    multiplicativeBucket(id, buckets).cast("double") / buckets

  /** Weighted subsampling: keep each row iff hashUnit(id) < weight —
    * every row kept with probability equal to its weight column (clamped
    * by construction to [0,1] coins), deterministically: reruns keep the
    * SAME rows, appends never reshuffle prior decisions. The quality-
    * weighted corpus resampling step of LLM data pipelines, as a pure
    * filter (no shuffle, no RNG state). */
  def weightedKeep(df: DataFrame, idCol: String, weightCol: String): DataFrame =
    df.where(hashUnit(col(idCol)) < col(weightCol))

  /** Token-budget corpus assembly: keep rows of each group, in
    * deterministic hash order, while the group's running token total
    * stays within `budget` — the "N tokens per source" cut of corpus
    * building (caps VOLUME where capPerGroup caps row count). Same
    * shuffle shape as capPerGroup: one exchange by group, a running-sum
    * window that streams per group. */
  def takeTokenBudget(df: DataFrame, groupCol: String, idCol: String,
                      tokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(multiplicativeBucket(col(idCol), 1 << 30), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(tokCol)).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Class rebalancing: keep at most `cap` rows per group, chosen by
    * deterministic hash order of the id (multiplicative hash → same rows
    * survive on rerun, and the kept set is a uniform sample of each
    * group, not its first/last rows). One shuffle, partitioned by the
    * group key; per-group state in the window is a row counter, so a
    * hot group streams — it never materializes in memory. A skewed group
    * at 100 TB still funnels through one task; for per-group caps that is
    * inherent (the row_number is a per-group total order) — cap the
    * damage by filtering obviously-over-cap groups first if needed. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(multiplicativeBucket(col(idCol), 1 << 30), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Exact-size weighted sample per group WITHOUT replacement —
    * Efraimidis–Spirakis A-ES reservoir keys ("Weighted random sampling
    * with a reservoir", IPL 2006): each row draws the exponential clock
    * key −ln(u)/w and the k SMALLEST keys per group win; inclusion
    * probability tracks weight, sample size is exactly k (where
    * [[weightedKeep]] keeps a Bernoulli — random-size — subset). The
    * coin u is the deterministic multiplicative-hash unit of the id
    * shifted into (0,1] (the +1 keeps ln finite), so reruns pick the
    * SAME sample and appends never reshuffle prior picks.
    *
    * Determinism: u is an exact rational, −ln rides the shared-ln
    * contract, one division by the exact weight; ties (identical ids
    * impossible, identical keys near-impossible) break by id. Scale
    * shape: one exchange by group, a per-group rank window that streams
    * (row_number only) — same cost envelope as [[capPerGroup]].
    *
    * Weight contract: A-ES keys are only defined for w > 0 — w = 0
    * yields an Inf (or NaN) clock and w < 0 INVERTS the sampling order,
    * both silently wrong. Rows with NULL or non-positive weight are
    * ineligible and filtered out before keying (the zero-weight row
    * "never fires", which is also its A-ES limit behavior). */
  def weightedReservoirPerGroup(df: DataFrame, groupCol: String,
                                idCol: String, weightCol: String,
                                k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val buckets = 1 << 20
    val u = (multiplicativeBucket(col(idCol), buckets).cast("double") + 1.0) /
      buckets.toDouble
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__key"), col(idCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__key", -log(u) / col(weightCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__key", "__rn")
  }

  /** Deterministic source-balanced training order: round-robin
    * interleave across sources so no contiguous run of one source
    * appears in the epoch stream (the data-ordering step between corpus
    * assembly and sequence packing — a source-sorted epoch trains the
    * early steps on one distribution). Each row gets
    * `pos = (rn−1)·k + srcIdx` where rn is its deterministic rank
    * WITHIN its source (multiplicative-hash order — a stable shuffle,
    * not ingest order) and srcIdx the source's rank among the k
    * sources: a total order that cycles sources every k positions.
    * Exhausted sources leave gaps in `pos` — it is an ORDERING key,
    * not a contiguous index.
    *
    * Scale shape: one exchange by source for the per-source rank
    * window, one broadcast of the k-row source table; no global window
    * anywhere (the global order is ARITHMETIC, which is the point —
    * writers range-partition on `pos` to emit the interleaved stream). */
  def curriculumInterleave(df: DataFrame, sourceCol: String,
                           idCol: String): DataFrame = {
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(multiplicativeBucket(col(idCol), 1 << 30), col(idCol))
    val sources = df.select(col(sourceCol)).distinct()
      .withColumn("__src_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(sourceCol))) - 1)
    df.join(broadcast(sources.crossJoin(
          sources.agg(count(lit(1)).cast("long").as("__k")))), Seq(sourceCol))
      .withColumn("__rn", row_number().over(wSrc).cast("long"))
      .withColumn("pos", (col("__rn") - 1) * col("__k") + col("__src_idx"))
      .drop("__rn", "__k", "__src_idx")
  }
}
