package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch phase-attribution probe for q29 at scale — not shipped. */
object DevQ29Probe {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val base = graft.core.Tables.documents(spark, d).select("doc_id", "text")
    val mutants = base.where(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", concat(col("text"), lit(" extra suffix token")))
    val df = base.unionByName(mutants)

    val docs = df.select(col("doc_id").as("id"), col("text"))
      .withColumn("toks", Dedup.tokens(col("text")))
      .withColumn("sh", graft.plans.VectorExpressions.shingleHashes(col("toks"), 3))
      .select(col("id"), col("sh"), size(col("sh")).as("sz"))
      .where(col("sz") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("phase1 shingle+persist")(docs.count())
    val posting = docs.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    time("posting count")(println(posting.count()))
    val freq = posting.groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") >= 2)
    time("freq (df>=2) count")(println(freq.count()))
    val prefFrac = 0.5 / 1.5
    val ranked = posting.join(freq, Seq("g"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("g"))))
      .where(col("rk") <= col("sz") - floor(col("sz") * prefFrac) + 1)
      .select(col("g"), col("id"), col("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("ranked prefix count")(println(ranked.count()))
    val a = ranked.select(col("g"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = ranked.select(col("g"), col("id").as("id_b"), col("sz").as("sz_b"))
    val cand = a.join(b, Seq("g"))
      .where(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")).cast("double") /
          greatest(col("sz_a"), col("sz_b")) >= 0.5)
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cand pairs count")(println(cand.count()))
    val arrA = docs.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val arrB = docs.select(col("id").as("id_b"), col("sh").as("sh_b"))
    time("verify join") {
      println(cand.join(arrA, Seq("id_a")).join(arrB, Seq("id_b"))
        .withColumn("jaccard", round(
          graft.plans.VectorExpressions.jaccardSorted(col("sh_a"), col("sh_b")), 6))
        .where(col("jaccard") >= 0.5).count())
    }
    spark.stop()
  }
}
