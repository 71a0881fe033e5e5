package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks
import graft.operators.Validation

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sink").toString

  test("partitioned-by-year sink overwrites only touched partitions") {
    val path = s"${tmp()}/table"
    val v1 = Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "yr", "v")
    Sinks.writePartitionedByYear(v1, path, "yr")
    // second write touches only 2024 — 2023 must survive (dynamic overwrite)
    val v2 = Seq((3, 2024, "B")).toDF("id", "yr", "v")
    Sinks.writePartitionedByYear(v2, path, "yr")
    val got = spark.read.parquet(path).select("id", "yr", "v")
      .as[(Int, Int, String)].collect().toSet
    assert(got == Set((1, 2023, "a"), (3, 2024, "B")))
  }

  test("reject-channel sink splits valid/reject with counts") {
    val df = Seq((1, "7"), (2, "x")).toDF("id", "amt")
    val (valid, rejects) = Validation.split(df, Seq(Validation.numeric("amt")))
    val base = tmp()
    val (nv, nr) = Sinks.writeWithRejects(valid, rejects,
      s"$base/main", s"$base/rejects")
    assert(nv == 1 && nr == 1)
    val rej = spark.read.json(s"$base/rejects").collect()(0)
    assert(rej.getAs[String]("_failed_rules") == "amt_numeric")
  }

  test("json-records sink preserves non-ASCII") {
    val path = s"${tmp()}/json"
    Sinks.writeJsonRecords(Seq(("ผู้ขาย", 1)).toDF("name", "n"), path)
    val back = spark.read.json(path).collect()(0)
    assert(back.getAs[String]("name") == "ผู้ขาย")
  }
}
