package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for 100 TB-scale profiling.
  *
  * The workhorse is a PORTABLE HyperLogLog (Flajolet et al. '07, with the
  * HLL practicalities from Heule et al., EDBT '13): the hash is the first
  * 15 hex nibbles of md5 (60 bits), so any engine that can compute md5
  * reproduces the registers bit-for-bit — the same portability family as
  * the LSH/simhash oracles. Spark's own `approx_count_distinct` uses
  * HLL++ with an engine-private xxHash64 seed, which is fine for one
  * engine but impossible to cross-check; this sketch trades a few % of
  * hash speed for engine-independent registers, which also means sketches
  * computed by DIFFERENT systems (a Spark batch job, a Trino ad-hoc
  * query, a streaming collector) can be merged.
  *
  * Why sketches at all: `COUNT(DISTINCT x)` at 100 TB shuffles every
  * distinct value; the sketch is a 256-byte mergeable summary computed
  * with map-side combine — per-group state is constant, the exchange
  * carries (group, idx, rho) rows bounded by 256/group, and sketches for
  * disjoint partitions/days/sources union by register-max (associative,
  * commutative, idempotent — re-merging the same day twice is safe).
  *
  * Precision p=8 → m=256 registers → standard error 1.04/√256 ≈ 6.5%.
  */
object Sketches {

  private val M = 256 // registers (p = 8 index bits; 52 rank bits remain)
  private val RemBits = 52
  private val RemMask = (1L << RemBits) - 1

  /** 60-bit portable hash: first 15 hex nibbles of md5 of the value's
    * string form. */
  private def h60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-(group, register) rank rows: idx in [0, 256), rho = leading-zero
    * count of the 52 rank bits + 1 (in [1, 53]). `bin()` renders a long
    * without leading zeros on every engine, so rho = 53 - length(bin(rem))
    * is the portable spelling of the leading-zero count. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val h = h60(col(valueCol))
    val rem = h.bitwiseAND(lit(RemMask))
    df.select(groupCols.map(col) :+
        shiftright(h, RemBits).as("idx") :+
        when(rem === 0, lit(RemBits + 1))
          .otherwise(lit(RemBits + 1) - length(bin(rem))).as("rho"): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("rho")).cast("int").as("rho"))
  }

  /** Merge register sets (sketch union): register-wise max. Inputs are
    * `hllRegisters`-shaped frames over the same group columns. */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("rho")).cast("int").as("rho"))

  /** Cardinality estimate per group from a register frame.
    *
    * Engineered for cross-engine exactness: the register sum
    * Σ 2^(-rho) is computed as the INTEGER Σ 2^(53-rho) (exact — each
    * term ≥ 1, total < 2^62 — so it is associativity-independent, unlike
    * a float sum whose value depends on reduce order), and the constants
    * fold from identical literals. Small-range correction (linear
    * counting) applies below 2.5m when empty registers remain, as in the
    * original paper. Returns (groupCols..., est_distinct) at 4 dp. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
    val pow53 = lit(9007199254740992.0) // 2^53 as an exact double literal
    val grouped = regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${RemBits + 1} - rho)")).as("s_present"),
        count(lit(1)).as("n_present"))
    grouped
      .withColumn("zeros", lit(M) - col("n_present"))
      // absent registers contribute 2^53 each (rho = 0)
      .withColumn("s_int",
        col("s_present") + col("zeros").cast("long") * lit(1L << RemBits << 1))
      .withColumn("raw",
        alpha * lit(M.toDouble) * lit(M.toDouble) * pow53 / col("s_int").cast("double"))
      .withColumn("est_distinct",
        round(when(col("raw") <= lit(2.5 * M) && col("zeros") > 0,
            lit(M.toDouble) * log(lit(M.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw")), 4))
      .select((groupCols.map(col) :+ col("est_distinct")): _*)
  }

  /** One-call profile: per-group HLL estimate side by side with the exact
    * distinct count and a register digest (md5 over "idx:rho" pairs in
    * index order — a cheap cross-engine witness that the REGISTERS, not
    * just the estimate, agree). At scale the exact column is the thing
    * this operator exists to avoid; it rides along here because the test
    * corpus is small and the estimate's error contract (±~6.5%) is the
    * property worth pinning. */
  def hllProfile(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val regs = hllRegisters(df, groupCols, valueCol)
    val est = hllEstimate(regs, groupCols)
    val digest = regs
      .groupBy(groupCols.map(col): _*)
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("idx"), col("rho")))),
          x => concat_ws(":", x.getField("idx"), x.getField("rho"))))).as("reg_digest"))
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    est.join(digest, groupCols).join(exact, groupCols)
  }
}
