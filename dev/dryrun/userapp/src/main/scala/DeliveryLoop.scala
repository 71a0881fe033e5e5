// DEPLOY dry run, leg 4: the continuous-ingestion loop — three "daily"
// deliveries deduped against the growing portable MinHash index via
// dedupBatchAgainstIndex (DEPLOY's incremental-ingestion clause), as a
// user would run it from a nightly spark-submit job.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object DeliveryLoop {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DeliveryLoop <dataDir> <outDir>")
    val dataDir = args(0); val outDir = args(1)
    val spark = SparkSession.builder().appName("delivery-loop").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dataDir/documents.parquet")
      .select("doc_id", "text")

    // day 1: a fresh slice; day 2: new slice + near-dups of day 1;
    // day 3: new slice + re-sends of day 2 (must all drop)
    def slice(m: Int) = docs.where(col("doc_id") % 10 === m)
    val day1 = slice(0)
    val day2 = slice(1).unionByName(
      day1.limit(500).select((col("doc_id") + 700000).as("doc_id"),
        concat(col("text"), lit(" near dup tail")).as("text")))
    val day3 = slice(2).unionByName(
      slice(1).limit(800).select((col("doc_id") + 800000).as("doc_id"),
        col("text")))

    val (out, idx) = (s"$outDir/corpus", s"$outDir/index")
    Seq("day1" -> day1, "day2" -> day2, "day3" -> day3).foreach {
      case (tag, batch) =>
        val t0 = System.nanoTime()
        Dedup.dedupBatchAgainstIndex(batch, "doc_id", "text", out, idx,
          n = 3, k = 16, bands = 4, threshold = 0.5)
        val secs = (System.nanoTime() - t0) / 1e9
        val nIdx = spark.read.parquet(idx).select("id").distinct().count()
        val nOut = spark.read.parquet(out).count()
        println(f"[loop] $tag in=${batch.count()} corpus=$nOut " +
          f"indexDocs=$nIdx secs=$secs%.1f")
    }
    spark.stop()
  }
}
