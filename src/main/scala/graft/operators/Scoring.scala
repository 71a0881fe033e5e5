package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — linear classifier INFERENCE over
  * hashed token features (the fasttext-style quality filter every
  * published pretraining pipeline runs somewhere between heuristic
  * cleaning and dedup).
  *
  * Scale shape: scoring is a pure per-row fold — the hashed weight
  * lookup rides into the row as a literal/broadcast-sized expression
  * (the IVF-codebook pattern: models are small, corpora are not), the
  * token stream folds to an exact INTEGER margin numerator inside one
  * projection, and nothing shuffles. A 100 TB corpus scores in one
  * map-only pass with the scan's own parallelism.
  *
  * Portability: feature buckets come from the same 60-bit md5 family as
  * the sketches, weights are integers, and the margin divides by a
  * power of two — every arithmetic step is exact in both engines, so
  * scores hash-match rather than "match within epsilon". (A sigmoid is
  * presentation: monotone in the margin, it changes no keep/drop
  * decision, so the engine keeps the exact margin and leaves squashing
  * to the caller.)
  */
object Scoring {

  /** Hashed feature bucket of a token: portable 60-bit md5 hash mod
    * nBuckets (hash is non-negative, so plain mod is portable). */
  def featureBucket(token: Column, nBuckets: Int): Column =
    conv(substring(md5(token), 1, 15), 16, 10).cast("long") % nBuckets

  /** Per-document linear margin over hashed token features:
    * margin = (Σ_tokens weightOf(bucket(token))) / 2^scalePow, with the
    * sum accumulated as an exact long. `weightOf` maps a bucket column
    * to an INTEGER weight column (a literal `when`/`element_at` over a
    * trained weight table — model-sized, never data-sized).
    *
    * Output: idCol, n_tokens, margin (double), kept (margin > 0).
    * The token column must be materialized before the fold (HOF lambdas
    * re-evaluate captured expressions per element — the established
    * shingleHashes pitfall). */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int, weightOf: Column => Column,
                        scalePow: Int = 6): DataFrame = {
    val toksed = df.select(col(idCol),
      Dedup.tokens(col(textCol)).as("__toks"))
    toksed.select(
        col(idCol),
        size(col("__toks")).as("n_tokens"),
        (aggregate(col("__toks"), lit(0L),
          (acc, t) => acc + weightOf(featureBucket(t, nBuckets)).cast("long"))
          / lit(math.pow(2, scalePow))).as("margin"))
      .withColumn("kept", col("margin") > 0)
  }

  /** Score-calibration reliability table: fixed equal-width score bins
    * (the q184/q186 fixed-grid argument — data-dependent edges make two
    * models' tables incomparable), per bin the count and the observed
    * positive rate. A well-calibrated score has rate rising
    * monotonically with the bin; the table is the input to both the
    * reliability plot and a Platt/isotonic recalibration step. Exact
    * integers everywhere; the single rate division rounds once.
    * One bins-bounded aggregation. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"bad calibration domain [$lo,$hi)/$bins")
    val w = (hi - lo) / bins
    df.where(col(scoreCol).isNotNull)
      .groupBy(least(greatest(floor((col(scoreCol) - lit(lo)) / lit(w)),
        lit(0.0)), lit((bins - 1).toDouble)).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"))
  }

  /** Per-group binary classification report: confusion counts plus
    * precision/recall/F1 — exact integer counts, three rounded
    * divisions; degenerate denominators yield NULL, not NaN. One
    * group-keyed aggregation. */
  def classificationReport(df: DataFrame, groupCol: String,
                           predCol: String, labelCol: String): DataFrame = {
    val p = col(predCol).cast("boolean")
    val y = col(labelCol).cast("boolean")
    val agg = df.groupBy(col(groupCol).as("grp"))
      .agg(sum(when(p && y, 1L).otherwise(0L)).as("tp"),
        sum(when(p && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(!p && y, 1L).otherwise(0L)).as("fn"),
        sum(when(!p && !y, 1L).otherwise(0L)).as("tn"))
    agg.select(col("grp"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
        .as("precision"),
      when(col("tp") + col("fn") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
        .as("recall"),
      when(col("tp") * 2 + col("fp") + col("fn") > 0,
        round(col("tp").cast("double") * 2 /
          (col("tp") * 2 + col("fp") + col("fn")), 6)).as("f1"))
  }

  /** ROC-AUC per group from ranks (the Mann–Whitney U identity):
    * AUC = (Σ avg-rank of positives − nPos(nPos+1)/2) / (nPos·nNeg) —
    * the classifier-evaluation metric for the scoring family, computed
    * WITHOUT thresholds, curves, or a single float comparison: scores
    * rank with `rank()` plus the tie-midpoint correction
    * (rank + (ties−1)/2, the textbook tie handling), so on integer or
    * quantized scores every intermediate is an exact rational and any
    * SQL engine reproduces the value bit for bit. Degenerate groups
    * (one class absent) return NULL, not a division by zero.
    *
    * Scale shape: one exchange by group for the rank window (score
    * ranks stream — no per-row state), one tie-count aggregation
    * sharing that partitioning, one final row per group.
    *
    * NULL labels are excluded BEFORE ranking: an unlabeled row is not an
    * observation of either class, and letting it occupy a score rank
    * while counting in neither n_pos nor n_neg would silently skew the
    * rank-sum (the Mann–Whitney identity assumes ranks over exactly the
    * labeled sample). */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df.select(col(groupCol).as("grp"),
        col(scoreCol).as("s"), col(labelCol).cast("boolean").as("pos"))
      .where(col("pos").isNotNull)
      .withColumn("rk", rank().over(
        Window.partitionBy(col("grp")).orderBy(col("s"))))
      .withColumn("avg_rk",
        col("rk").cast("double") +
          (count(lit(1)).over(Window.partitionBy(col("grp"), col("s")))
            .cast("double") - 1.0) / 2.0)
    ranked.groupBy("grp")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("pos"), col("avg_rk"))).as("r_pos"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0, round(
          (col("r_pos") - col("n_pos").cast("double") *
            (col("n_pos") + 1).cast("double") / 2.0) /
            (col("n_pos") * col("n_neg")).cast("double"), 6)).as("auc"))
  }
}
