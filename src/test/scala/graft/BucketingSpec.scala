package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** SURVEY §4 scale claim, demonstrated: two tables bucketed on the join key
  * co-locate — the join plans with zero shuffle exchanges. At 100 TB this is
  * the difference between a network-bound sort-merge join and a local one;
  * the same mechanism backs repeated joins on a shared key across a
  * pipeline (bucket once, join many times). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is static per session; tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      l.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), "o_orderkey")
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      joined.collect() // force execution
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the join itself must be exchange-free; only the final 1-column
      // aggregation may shuffle
      val joinPlan = joined.queryExecution.executedPlan.toString()
      assert(joinPlan.contains("SortMergeJoin"))
      assert(exchanges.size <= 1, s"expected <=1 exchange (agg only), got ${exchanges.size}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
