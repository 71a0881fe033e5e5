package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline. O(n·m) dot products via
  *    `zip_with`/`aggregate` (codegen'd, no UDF). The small query side is
  *    broadcast, so the big corpus never shuffles.
  *  - LSH-bucketed ANN (random hyperplanes) — the scale path: sign-bit
  *    sketch of each vector against `nPlanes` deterministic hyperplanes,
  *    candidates = same bucket (multi-probe over `nTables` independent
  *    tables), verified with exact cosine. Shuffle volume is
  *    O(rows × nTables), independent of corpus pair count.
  * Hyperplanes are derived from xxhash64(seed, dim, plane) → uniform in
  * [-1,1] — deterministic across runs/executors without shipping a matrix. */
object Similarity {

  import graft.plans.VectorExpressions.{dot => vdot}

  /** Cosine similarity of two float-array columns (null-safe, 0 when either
    * norm is 0). The dot products run in a custom Catalyst expression — one
    * tight JVM loop per row, accumulating in double left-to-right (bit-equal
    * to a sequential SQL list_sum formulation, keeping oracles exact). */
  def cosine(a: Column, b: Column): Column = {
    val d  = vdot(a, b)
    val na = sqrt(vdot(a, a))
    val nb = sqrt(vdot(b, b))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Brute-force exact top-k: for each row of `queries`, the k nearest rows
    * of `corpus` by cosine. `queries` is broadcast — corpus partitions stream
    * once with no shuffle; the only exchange is the final per-query top-k
    * (rank window over query id). Self-matches (same id) are excluded.
    * Norms are precomputed per side (once per row, not once per pair). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(vdot(col("cv"), col("cv"))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(vdot(col("qv"), col("qv"))))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("cos", when(col("qn") === 0.0 || col("cn") === 0.0, lit(0.0))
        .otherwise(vdot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }

  /** Sign-bit LSH bucket id of a vector for one hash table: `nPlanes` dot
    * products against hash-derived pseudo-random hyperplanes, packed into a
    * long (custom expression — one loop, no plane matrix to broadcast). */
  def lshBucket(vec: Column, table: Int, nPlanes: Int): Column =
    graft.plans.VectorExpressions.hyperplaneBucket(vec, table, nPlanes)

  /** ANN top-k via multi-table, multiprobe hyperplane LSH: the corpus is
    * bucketed once per table; each query probes its own bucket plus every
    * bucket at Hamming distance 1 (flip one sign bit). Exact cosine re-ranks
    * the candidates.
    *
    * Tuning model (p = per-plane agreement prob for a target neighbor):
    * per-table hit prob ≈ p^b + b·(1-p)·p^(b-1); recall = 1-(1-hit)^T.
    * With b=8, T=4 on weakly-clustered data (top-1 cos ≈ 0.37 → p ≈ 0.62)
    * this reaches ~50% recall while scanning ~15% of the corpus — the knob
    * to raise recall at scale is T (more tables), not brute force. */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nTables: Int = 4, nPlanes: Int = 8): DataFrame = {
    def buckets(v: String, probe: Boolean): Column = {
      val per: Seq[Column] = (0 until nTables).flatMap { t =>
        val b0 = lshBucket(col(v), t, nPlanes)
        val exact = struct(lit(t).as("t"), b0.as("b"))
        if (!probe) Seq(exact)
        else exact +: (0 until nPlanes).map(i =>
          struct(lit(t).as("t"), b0.bitwiseXOR(shiftleft(lit(1L), i)).as("b")))
      }
      explode(array(per: _*))
    }
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("bucket", buckets("cv", probe = false))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", buckets("qv", probe = true))
    // score before the pair-dedup: the vectors cross only the bucket join;
    // the dedup + rank shuffles carry (query_id, corpus_id, cos) scalars.
    val cands = c.join(q, Seq("bucket"))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .select("query_id", "corpus_id", "cos")
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cands.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCentroids`
    * clusters (centroids = the lowest-id vectors — deterministic, no
    * training iteration; swap in k-means centroids when a trained codebook
    * exists), assign each corpus vector to its nearest centroid once, and
    * have each query probe its `nProbe` nearest centroids. Exact cosine
    * re-ranks within probed clusters.
    *
    * Scale shape: assignment is one broadcast pass over the corpus
    * (nCentroids dots per row); the probe join exchanges only
    * (centroid_id, vector) pairs for the probed fraction —
    * candidates/query ≈ corpus × nProbe / nCentroids. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int = 16,
              nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    def assign(df: DataFrame, id: String, v: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(col("cdot").desc, col("cid"))
      df.select(col(idCol).as(id), col(vecCol).as(v))
        .crossJoin(broadcast(cents))
        .withColumn("cdot", cosine(col(v), col("cvec")))
        .withColumn("crnk", row_number().over(w))
        .where(col("crnk") <= keep)
        .drop("cvec", "cdot", "crnk")
    }
    val assigned = assign(corpus, "corpus_id", "cv", 1)
    val probes   = assign(queries, "query_id", "qv", nProbe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    // no pair-dedup needed: each corpus row lives in exactly one cluster
    // (keep=1) and a query probes distinct clusters, so the join yields each
    // (query, corpus) pair at most once.
    assigned.join(probes, Seq("cid"))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }
}
