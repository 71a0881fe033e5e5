package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for the named queries (all
  * queries if no args) — the evidence loop for "is this the plan I'd want
  * at 100 TB": PushedFilters reaching the scan, ReadSchema pruned, small
  * sides broadcast, WholeStageCodegen spans wide. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n================ $n ================")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"(explain failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
