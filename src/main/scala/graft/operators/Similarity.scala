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

  /** Cosine similarity of two float-array columns (null-safe, 0 when either
    * norm is 0). Accumulates in double precision, left-to-right — stable. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Brute-force exact top-k: for each row of `queries`, the k nearest rows
    * of `corpus` by cosine. `queries` is broadcast — corpus partitions stream
    * once with no shuffle; the only exchange is the final per-query top-k
    * (rank window over query id). Self-matches (same id) are excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }

  /** Deterministic random-hyperplane component for (table, plane, dim):
    * xxhash64 → uniform double in [-1, 1]. */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (xxhash64(lit(table), lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-bit LSH bucket id of a vector for one hash table: `nPlanes` dot
    * products against pseudo-random hyperplanes, packed into a long. */
  def lshBucket(vec: Column, table: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (v, i) => v.cast("double") * planeComponent(table, p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

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
    val cands = c.join(q, Seq("bucket"))
      .where(col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id", "qv", "cv")
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cands.withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }
}
