package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: deterministic `factor`x scale-up of a testdata directory —
  * the data side of the scale-validation bench (PLANS.md "sf0.1 → sf1").
  * `runMain graft.MakeScale <srcDir> <outDir> <factor>`.
  *
  * Scaling follows the TPC-H discipline: DIMENSIONS scale with the facts
  * (replica r's orders reference replica r's customers/parts/suppliers),
  * so per-key fan-in — rows per supplier, lines per order, events per
  * user — stays CONSTANT while key cardinality and row count grow by
  * `factor`. That is what 100 TB actually looks like (more keys, not
  * deeper keys), and what makes measured sf0.1→sf1 ratios meaningful:
  * a linear operator should scale ~linearly, and anything super-linear
  * is an algorithmic term, not a key-skew artifact of the generator.
  *
  * Per-replica transforms keep cross-replica similarity OUT of the
  * similarity families (otherwise every replica pair is a near-dup pair
  * and pair counts grow QUADRATICALLY in `factor` — a generator bug that
  * would masquerade as an operator scaling defect):
  *   - documents: replica r > 0 prefixes every whitespace token with a
  *     two-letter salt ("q"+letter, inside the [a-z] analysis channel).
  *     A per-replica BIJECTION on words preserves every within-replica
  *     set-similarity relation exactly (shingle sets map 1:1), while
  *     cross-replica token shingles share nothing. n_chars recomputes.
  *   - embeddings: replica r applies an ORTHOGONAL per-replica transform
  *     (rotate left by r mod dim, then sign-flip a bit pattern drawn from
  *     r div dim) — norms and within-replica cosines are preserved
  *     exactly, cross-replica cosines decorrelate. The sign-flip leg
  *     exists because rotation alone wraps at the embedding dim: with
  *     dim=64, factor>64 would hand replicas r and r-64 byte-identical
  *     vectors, re-creating exactly the quadratic cross-replica duplicate
  *     families the generator must exclude.
  *   - events: replica r shifts ts by r * (span + 1 day) and user_id by
  *     the key step — windows, sessions and cohorts stay replica-local,
  *     so streaming state KEY CARDINALITY grows by `factor` (the state
  *     dimension the RocksDB option exists for).
  *   - entity NAMES (p_name, s_name, c_name) get the same per-replica
  *     word bijection: verbatim copies would make every name a
  *     factor-sized exact-duplicate group, and the name-similarity
  *     joins (edit-distance PASS-JOIN, shingle linkage) would produce
  *     factor²-growing pair sets — a generator artifact masquerading
  *     as operator super-linearity.
  * region/nation stay as-is (25 nations is a constant of the schema).
  *
  * Optional 4th arg `--skew-suppkey`: redraw lineitem's l_suppkey from an
  * approximate Zipf(1) over the FULL scaled supplier key space (rank =
  * floor(K^u) for a per-row deterministic uniform u, so rank 1 alone
  * carries ~ln(2)/ln(K) of all rows — ~7% at sf1's K=10^4). Every other
  * table is written unchanged, so a skewed dir differs from its plain
  * twin in exactly one column — the controlled input for measuring
  * plain-vs-AQE-vs-salted join behavior under a genuinely hot key
  * (constant per-key fan-in, the default, deliberately CANNOT exercise
  * that path). Foreign-key validity is preserved: ranks map back into
  * the scaled key space (base key in [1, S0], replica stripe via Step). */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val skewSuppkey = args.drop(3).contains("--skew-suppkey")
    // 676 = one full 2-letter salt alphabet; the fixed-width salt below is
    // collision-free exactly up to there (and 676x the base already
    // overshoots any scale this harness can hold)
    require(factor >= 1 && factor <= 676, s"factor $factor out of [1,676]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val Step = 10000000L // clears every sf0.1 key range by >10x
    val reps = broadcast(spark.range(factor).select(col("id").as("__r")))
    def src(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
      println(s"[make_scale] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }
    def shift(c: String): org.apache.spark.sql.Column =
      col(c) + col("__r") * Step

    // per-replica word bijection, shared by document text and entity names.
    // FIXED-WIDTH two-letter salt (base-26): variable-width salts collide
    // by prefixing ("qb"+"b..." == "qbb"+"...") and a modulo salt wraps at
    // 676 — equal-length salts are pairwise-distinct for every allowed
    // factor, which is what the cross-replica disjointness claim needs
    val salt = concat(lit("q"),
      chr(lit(97) + col("__r") % 26),
      chr(lit(97) + floor(col("__r") / 26).cast("int") % 26))
    def saltWords(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(col("__r") === 0, c).otherwise(
        array_join(transform(split(c, " "),
          t => when(t === "", t).otherwise(concat(salt, t))), " "))

    write(src("region"), "region")
    write(src("nation"), "nation")
    write(src("customer").crossJoin(reps)
      .select(shift("c_custkey").as("c_custkey"),
        saltWords(col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")
    write(src("supplier").crossJoin(reps)
      .select(shift("s_suppkey").as("s_suppkey"),
        saltWords(col("s_name")).as("s_name"),
        col("s_nationkey"), col("s_acctbal")), "supplier")
    write(src("part").crossJoin(reps)
      .select(shift("p_partkey").as("p_partkey"),
        saltWords(col("p_name")).as("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice")), "part")
    write(src("orders").crossJoin(reps)
      .select(shift("o_orderkey").as("o_orderkey"),
        shift("o_custkey").as("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")), "orders")
    // --skew-suppkey: Zipf(1)-approximate supplier draw. u is a per-row
    // deterministic uniform in (0,1); rank = floor(K^u) gives
    // P(rank <= k) ~ ln(k)/ln(K), i.e. rank 1 alone gets ~ln(2)/ln(K) of
    // all rows. The rank maps back into the scaled key space (base key +
    // replica stripe), so every drawn key exists in `supplier`.
    val s0 = if (skewSuppkey) src("supplier").count() else 0L
    val skewedSupp = {
      val k = s0 * factor
      val u = (pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("__r")),
        lit(1000000L)) + 1).cast("double") / 1000001.0
      val rank = least(greatest(floor(pow(lit(k.toDouble), u)), lit(1.0)), lit(k.toDouble))
        .cast("long")
      (rank - 1) % s0 + 1 + floor((rank - 1) / lit(s0)).cast("long") * Step
    }
    write(src("lineitem").crossJoin(reps)
      .select(shift("l_orderkey").as("l_orderkey"),
        shift("l_partkey").as("l_partkey"),
        (if (skewSuppkey) skewedSupp else shift("l_suppkey")).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")), "lineitem")

    // events: time-shift each replica past the previous one so windows,
    // sessions, watermarks and cohorts never straddle replicas
    val ev = graft.core.Tables.events(spark, srcDir)
    val spanSec = ev.agg((unix_timestamp(max("ts")) -
      unix_timestamp(min("ts")) + 86400L).as("s")).head().getLong(0)
    write(ev.crossJoin(reps)
      .select(shift("event_id").as("event_id"),
        timestamp_micros(unix_micros(col("ts")) +
          col("__r") * (spanSec * 1000000L)).as("ts"),
        shift("user_id").as("user_id"), col("event_type"), col("value"),
        col("props")), "events")

    // documents: per-replica word bijection (salt-prefix every token)
    val salted = saltWords(col("text"))
    write(src("documents").crossJoin(reps)
      .select(shift("doc_id").as("doc_id"), salted.as("text"), col("lang"),
        col("source"), length(salted).cast("long").as("n_chars")), "documents")

    // embeddings: per-replica ORTHOGONAL transform — rotate left by
    // r mod dim, then sign-flip the components selected by the bits of
    // q = r div dim (component i flips iff bit (i mod 10) of q is set).
    // Both legs are the SAME linear isometry for every vector of a
    // replica, so within-replica norms and cosines are preserved exactly;
    // (rot, q) is injective in r, so no two replicas up to the 676 cap
    // share a transform (rotation alone wraps at dim: r and r-dim would
    // be byte-identical — the sf10/factor=100 contamination ADVICE found)
    val dim = size(col("embedding"))
    val rot = (col("__r") % dim).cast("int")
    val qf = floor(col("__r") / dim).cast("int")
    val rotated = when(rot === 0, col("embedding")).otherwise(
      concat(slice(col("embedding"), rot + 1, dim - rot),
        slice(col("embedding"), lit(1), rot)))
    val flipped = when(qf === 0, rotated).otherwise(
      transform(rotated, (x, i) =>
        when(call_function("shiftright", qf, (i % 10).cast("int"))
          .bitwiseAND(lit(1)) === 1, -x).otherwise(x)))
    write(src("embeddings").crossJoin(reps)
      .select(shift("vec_id").as("vec_id"), flipped.as("embedding"),
        col("label")), "embeddings")

    spark.stop()
  }
}
