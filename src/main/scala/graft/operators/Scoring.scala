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
}
