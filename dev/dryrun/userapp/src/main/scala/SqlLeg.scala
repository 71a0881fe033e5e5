// DEPLOY dry run, leg 5: the SQL-ONLY adopter — every step in spark.sql
// over the graft_* functions registered by GraftExtensions, no Scala
// operator API at all. Builds a quality gate + simhash near-dup sweep +
// shingle-jaccard verify purely in SQL; the Scala side only counts rows.
import org.apache.spark.sql.SparkSession

object SqlLeg {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: SqlLeg <dataDir>")
    val spark = SparkSession.builder().appName("sql-leg").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql(s"CREATE OR REPLACE TEMP VIEW docs AS " +
      s"SELECT * FROM parquet.`${args(0)}/documents.parquet`")

    // quality gate from the positional stats array (layout in the
    // function's DESCRIBE output), then a simhash near-dup candidate
    // sweep banded on the fingerprint's top 16 bits, verified by
    // shingle-set jaccard — all graft_* kernels, pure SQL
    val out = spark.sql(
      """WITH scored AS (
        |  SELECT doc_id,
        |         split(lower(trim(text)), '\\s+') AS toks,
        |         graft_text_stats(text)[3] AS n_tokens,
        |         graft_rep_stats(text)[2]  AS max_tok_count
        |  FROM docs
        |), kept AS (
        |  SELECT doc_id, toks,
        |         graft_simhash64(toks) AS fp,
        |         graft_shingle_hashes(toks, 3) AS sh
        |  FROM scored
        |  WHERE n_tokens >= 20 AND max_tok_count <= n_tokens / 2
        |), banded AS (
        |  SELECT doc_id, fp, sh, shiftright(fp, 48) AS band FROM kept
        |), cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.doc_id < b.doc_id
        |   AND bit_count(a.fp ^ b.fp) <= 8
        |), verified AS (
        |  SELECT id_a, id_b,
        |         size(array_intersect(sh_a, sh_b)) /
        |         CAST(size(array_union(sh_a, sh_b)) AS DOUBLE) AS jac
        |  FROM cand
        |)
        |SELECT count(*) AS n_pairs, sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS n_dups
        |FROM verified""".stripMargin).collect()(0)
    val kept = spark.sql(
      "SELECT count(*) FROM docs WHERE graft_text_stats(text)[3] >= 20").collect()(0)
    println(s"[sql] kept=${kept.get(0)} candPairs=${out.get(0)} dups=${out.get(1)}")
    spark.stop()
  }
}
