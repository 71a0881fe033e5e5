package graft

import org.apache.spark.sql.functions._
import graft.core.ScanWidth

/** [[graft.core.ScanWidth]] — the row-group starvation guard. The
  * pathology it defends against: a table written as one parquet row
  * group puts every row into a single byte-range split, serializing any
  * scan-fused stage (measured concurrency 1.0 for q124's probe stage on
  * a single-row-group sf10 corpus). The guard must (a) repartition a
  * provably-starved layout, (b) leave healthy layouts and non-file
  * frames untouched, and (c) never change results. */
class ScanWidthSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_sw_$name")
    d.toFile.deleteOnExit()
    s"$d/t.parquet"
  }

  test("single-row-group parquet is widened to default parallelism") {
    val p = tmp("narrow")
    (1 to 1000).toDF("v").coalesce(1).write.parquet(p)
    val df = spark.read.parquet(p)
    assert(df.inputFiles.length == 1)
    val fixed = ScanWidth.ensure(df)
    assert(fixed.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // content identical, only the layout changed
    assert(fixed.agg(sum($"v")).head.getLong(0) == 500500L)
    assert(fixed.count() == 1000L)
  }

  test("a layout with enough files passes through untouched") {
    val p = tmp("wide")
    val par = spark.sparkContext.defaultParallelism
    (1 to 1000).toDF("v").repartition(par).write.parquet(p)
    val df = spark.read.parquet(p)
    assert(df.inputFiles.length >= par)
    // no repartition inserted: same plan object comes back
    assert(ScanWidth.ensure(df) eq df)
  }

  test("non-file frames (in-memory test data) pass through untouched") {
    val df = (1 to 10).toDF("v")
    assert(ScanWidth.ensure(df) eq df)
  }

  test("derived frames over a narrow scan are still widened") {
    val p = tmp("derived")
    (1 to 1000).toDF("v").coalesce(1).write.parquet(p)
    val df = spark.read.parquet(p).where($"v" % 2 === 0)
      .select(($"v" * 2).as("w"))
    val fixed = ScanWidth.ensure(df)
    assert(fixed.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(fixed.count() == 500L)
  }
}
