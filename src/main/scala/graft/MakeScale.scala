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
  *   - embeddings: replica r rotates the vector left by r components —
  *     norms and within-replica cosines are preserved exactly,
  *     cross-replica cosines decorrelate.
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
  * region/nation stay as-is (25 nations is a constant of the schema). */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1 && factor <= 1000, s"factor $factor out of [1,1000]")
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

    // per-replica word bijection, shared by document text and entity names
    val salt = concat(lit("q"),
      chr(lit(97) + col("__r") % 26),
      when(col("__r") >= 26, chr(lit(97) + (col("__r") / 26) % 26))
        .otherwise(lit("")))
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
    write(src("lineitem").crossJoin(reps)
      .select(shift("l_orderkey").as("l_orderkey"),
        shift("l_partkey").as("l_partkey"), shift("l_suppkey").as("l_suppkey"),
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

    // embeddings: rotate components by r — exact within-replica cosines
    val dim = size(col("embedding"))
    val rot = (col("__r") % dim).cast("int")
    val rotated = when(rot === 0, col("embedding")).otherwise(
      concat(slice(col("embedding"), rot + 1, dim - rot),
        slice(col("embedding"), lit(1), rot)))
    write(src("embeddings").crossJoin(reps)
      .select(shift("vec_id").as("vec_id"), rotated.as("embedding"),
        col("label")), "embeddings")

    spark.stop()
  }
}
