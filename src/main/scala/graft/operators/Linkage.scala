package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Record linkage (entity resolution) — the BIPARTITE cousin of the
  * near-dup family: match records of one table against records of
  * ANOTHER table by fuzzy text similarity, without an all-pairs join.
  *
  * The reference does linkage implicitly — dirty registry names arrive
  * from OCR and are matched to clean master data by normalization plus
  * exact keys (`ImportDbdFinancial.php:149-154` tax-id canonicalization,
  * `pdf_ocr_rm_to_json.py:219-229` common-prefix doc/ref repair). This
  * operator is the general form for when no exact key survives the
  * noise: character n-gram Jaccard with a prefix-filter candidate join
  * (PPJoin, Xiao et al., WWW '08), which is EXACT — the blocked result
  * equals the all-pairs result at the same threshold, so the oracle can
  * recompute it as a plain cross join at test scale.
  *
  * Scale shape (identical to [[Dedup.jaccardPairsPrefixFilter]], but
  * across two tables): candidate generation exchanges (gram-hash, id,
  * size) triples only, bucket sizes are bounded by gram document
  * frequency (rarest-first prefixes), df=1 grams are pruned before the
  * rank window, and the gram arrays cross exactly one exchange per side
  * for the verify join. No all-pairs anywhere; a 10^9-row registry
  * against a 10^6-row master joins on rare-gram buckets, not on the
  * cross product.
  */
object Linkage {

  /** Distinct word n-gram shingles of a text column as a sorted hash
    * array — the gram function for multi-word keys (addresses, titles,
    * document snippets). Choose grams by what DISCRIMINATES: char grams
    * suit single-token keys with char-level noise; on a low-vocabulary
    * corpus char grams are shared by everything (measured: 377 distinct
    * 3-grams across 5k docs → quasi-all-pairs candidates) while word
    * shingles stay rare (vocab^n universe). */
  def wordShingleHashes(s: Column, n: Int): Column = {
    val toks = Dedup.tokens(s)
    graft.plans.VectorExpressions.shingleHashes(toks, n)
  }

  /** Distinct character n-grams of a whitespace-normalized, lowercased
    * string, as a SORTED array of portable 60-bit md5 hashes (the
    * jaccardSorted kernel input shape; same hash family as the sketches,
    * so any md5-capable engine reproduces the gram sets bit-for-bit). */
  def charGramHashes(s: Column, n: Int): Column = {
    val norm = lower(regexp_replace(trim(s), "\\s+", " "))
    val cnt = greatest(length(norm) - (n - 1), lit(0))
    val grams = when(cnt < 1, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), cnt),
        i => norm.substr(i, lit(n)))))
    array_sort(array_distinct(transform(grams,
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))))
  }

  /** All (left_id, right_id, jaccard) pairs across two tables whose
    * character-n-gram Jaccard is >= threshold — complete at the given
    * threshold, never materializing the cross product.
    *
    * Prefix-filter completeness carries over from the self-join case
    * unchanged: under one GLOBAL gram order (df asc, hash asc — computed
    * over the union of both sides' postings), any pair with
    * J(A,B) >= t has overlap >= t/(1+t) * (|A|+|B|), so A and B must
    * share a gram inside each one's first |X| - floor(|X| * t/(1+t)) + 1
    * grams. Pruning df=1 grams (present in one record total, so never
    * shared) only shortens ranks, which keeps every true-prefix gram
    * inside the bound — the candidate set can only grow, and the exact
    * verify keeps the final result identical. */
  def linkPairsPrefixFilter(left: DataFrame, leftId: String, leftText: String,
                            right: DataFrame, rightId: String, rightText: String,
                            gramsOf: Column => Column,
                            threshold: Double = 0.55): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold $threshold out of (0,1]")
    def side(df: DataFrame, id: String, text: String): DataFrame =
      df.select(col(id).as("id"),
          gramsOf(col(text)).as("sh"))
        .select(col("id"), col("sh"), size(col("sh")).as("sz"))
        .where(col("sz") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = side(left, leftId, leftText)
    val r = side(right, rightId, rightText)
    // global df over BOTH sides' postings: the gram order must be one
    // total order shared by the two prefix computations, or completeness
    // breaks (a pair could rank its shared gram inside the prefix on one
    // side and outside on the other under divergent orders)
    val lPost = l.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    val rPost = r.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    val freq = lPost.select("g").unionAll(rPost.select("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2)
    val prefFrac = threshold / (1.0 + threshold)
    def prefix(post: DataFrame): DataFrame =
      post.join(freq, Seq("g"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df"), col("g"))))
        .where(col("rk") <= col("sz") - floor(col("sz") * prefFrac) + 1)
        .select(col("g"), col("id"), col("sz"))
    val a = prefix(lPost).select(col("g"), col("id").as("left_id"), col("sz").as("sz_a"))
    val b = prefix(rPost).select(col("g"), col("id").as("right_id"), col("sz").as("sz_b"))
    val cand = a.join(b, Seq("g"))
      .where(least(col("sz_a"), col("sz_b")).cast("double") /
        greatest(col("sz_a"), col("sz_b")) >= threshold)
      .select("left_id", "right_id").dropDuplicates("left_id", "right_id")
    // verify: sorted-hash-array linear-merge Jaccard; ROUND before the
    // threshold filter, matching the SQL oracle's round-then-filter order
    cand.join(l.select(col("id").as("left_id"), col("sh").as("sh_a")), Seq("left_id"))
      .join(r.select(col("id").as("right_id"), col("sh").as("sh_b")), Seq("right_id"))
      .withColumn("jaccard", round(
        graft.plans.VectorExpressions.jaccardSorted(col("sh_a"), col("sh_b")), 6))
      .where(col("jaccard") >= threshold)
      .select("left_id", "right_id", "jaccard")
  }

  /** The DECIDE step: best right-side match per left record (highest
    * Jaccard, right_id as the deterministic tie-break). Window partitions
    * by left_id — granular keys, never a global window. */
  def bestMatch(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("left_id"))
      .orderBy(col("jaccard").desc, col("right_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1).drop("rnk")
  }
}
