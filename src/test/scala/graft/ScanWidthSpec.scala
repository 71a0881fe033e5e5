package graft

import org.apache.spark.sql.functions._
import graft.core.ScanWidth

/** [[graft.core.ScanWidth]] — the row-group starvation guard. The
  * pathology it defends against: a table written as one parquet row
  * group puts every row into a single byte-range split, serializing any
  * scan-fused stage (measured concurrency 1.0 for q124's probe stage on
  * a single-row-group sf10 corpus). The guard must (a) repartition a
  * provably-starved layout WHOSE SIZE warrants it, (b) leave healthy
  * layouts, tiny inputs (the round-10 refinement: an exchange of a
  * sub-slot table costs more than its serialized scan) and non-file
  * frames untouched, and (c) never change results. */
class ScanWidthSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_sw_$name")
    d.toFile.deleteOnExit()
    s"$d/t.parquet"
  }

  /** A single-row-group parquet file several MB on disk: 60k rows of
    * incompressible (md5) text, one file, one row group — the starved
    * layout at a size where widening pays. */
  private def bigNarrow(name: String): String = {
    val p = tmp(name)
    spark.range(60000)
      .select(col("id"), concat_ws("",
        md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string")),
        md5((col("id") + 2).cast("string")),
        md5((col("id") + 3).cast("string"))).as("txt"))
      .coalesce(1).write.parquet(p)
    p
  }

  test("a large single-row-group parquet is widened proportional to size") {
    val df = spark.read.parquet(bigNarrow("narrow"))
    assert(df.inputFiles.length == 1)
    val fixed = ScanWidth.ensure(df)
    val n = fixed.rdd.getNumPartitions
    assert(n > 1, "starved multi-MB layout must widen")
    assert(n <= spark.sparkContext.defaultParallelism)
    // content identical, only the layout changed
    assert(fixed.count() == 60000L)
    assert(fixed.agg(sum($"id")).head.getLong(0) == 60000L * 59999L / 2)
  }

  test("a tiny single-row-group input passes through untouched") {
    // sub-slot bytes: the exchange would cost more than the serialized
    // scan it parallelizes (the round-9 toy-scale regression, closed)
    val p = tmp("tiny")
    (1 to 1000).toDF("v").coalesce(1).write.parquet(p)
    val df = spark.read.parquet(p)
    assert(df.inputFiles.length == 1)
    assert(ScanWidth.ensure(df) eq df)
  }

  test("work density is the call site's: a sub-MB starved corpus passes " +
    "at fingerprint density but widens at gram-explode density") {
    // the round-10 bench-gate catch: one 2 MB threshold recovered the
    // cheap fingerprint ops but serialized the gram-explode family on
    // the sub-MB sf0.1 corpus (q124 1.81x, q90 1.80x) — the same layout
    // must pass for one family and widen for the other
    val p = tmp("density")
    spark.range(8000)
      .select(col("id"), concat_ws("",
        md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string"))).as("txt"))
      .coalesce(1).write.parquet(p)
    val df = spark.read.parquet(p)
    assert(df.inputFiles.length == 1)
    val bytes = new java.io.File(new java.net.URI(df.inputFiles.head)).length
    assert(bytes > ScanWidth.GramExplodeSlotBytes &&
      bytes < ScanWidth.FingerprintSlotBytes,
      s"fixture must sit between the two slot sizes, got $bytes bytes")
    assert(ScanWidth.ensure(df) eq df,
      "sub-slot at fingerprint density must pass through")
    val widened = ScanWidth.ensure(df, ScanWidth.GramExplodeSlotBytes)
    assert(widened.rdd.getNumPartitions > 1,
      "gram-explode density must widen the same layout")
    assert(widened.count() == 8000L)
  }

  test("once the exchange is paid, the repartition goes FULL-width, " +
    "not decision-slot-width") {
    // the round-11 fix for the round-10 regression: a 0.57 MB gram corpus
    // computed want=3 from the 256 KB DECISION slot and repartitioned
    // 3-way where round-9 code went 32-way — ~0.25 s of fused gram work
    // per slot on the critical path (q124/q90/q95 1.1–1.2x vs r9 code,
    // 6/6 alternating-JVM samples). The exchange's cost is
    // ~width-independent, so once it fires the width must be the box
    // width — `want` only answers WHETHER, never HOW WIDE.
    val p = tmp("widen")
    spark.range(8000)
      .select(col("id"), concat_ws("",
        md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string"))).as("txt"))
      .coalesce(1).write.parquet(p)
    val df = spark.read.parquet(p)
    val bytes = new java.io.File(new java.net.URI(df.inputFiles.head)).length
    val target = spark.sparkContext.defaultParallelism
    val want = math.min(target.toLong, math.max(1L,
      (bytes + ScanWidth.GramExplodeSlotBytes - 1) / ScanWidth.GramExplodeSlotBytes))
    assert(want < target,
      s"fixture must make the decision width ($want) smaller than the box ($target)")
    val widened = ScanWidth.ensure(df, ScanWidth.GramExplodeSlotBytes)
    assert(widened.rdd.getNumPartitions == target,
      s"width must be the box width ($target), " +
        s"got ${widened.rdd.getNumPartitions} (decision want was $want)")
    // results unchanged, only the layout
    assert(widened.agg(sum($"id")).head.getLong(0) == 8000L * 7999L / 2)
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

  test("derived frames over a large narrow scan are still widened") {
    val df = spark.read.parquet(bigNarrow("derived"))
      .where($"id" % 2 === 0).select(($"id" * 2).as("w"))
    val fixed = ScanWidth.ensure(df)
    assert(fixed.rdd.getNumPartitions > 1)
    assert(fixed.count() == 30000L)
  }
}
