package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 K-ops), re-expressed for a columnar lake.
  *
  * The reference's MySQL tables become partitioned parquet: the
  * table-per-year scheme (gec_inv_2023/24/25) collapses into one table
  * partitioned by year (SURVEY §4), so year predicates prune directories
  * and a MERGE rewrites only affected partitions. */
object Sinks {

  /** K1: JSON record-array sink → JSON-lines (the scalable spelling of the
    * reference's pretty-printed arrays; non-ASCII preserved — Spark writes
    * UTF-8 without escaping by default). */
  def writeJsonRecords(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K2: CSV sink with header (bs/ic combined matrix shape). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** K4/K5/K6 target: partitioned parquet table keyed by a year column.
    * Dynamic partition overwrite = the bounded-rewrite MERGE target
    * (only partitions present in `df` are replaced — the plain-Spark
    * equivalent of upserting into the year tables). */
  def writePartitionedByYear(df: DataFrame, path: String, yearCol: String): Unit =
    df.sparkSession.conf.getOption("spark.sql.sources.partitionOverwriteMode") match {
      case _ =>
        df.write
          .mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(yearCol)
          .parquet(path)
    }

  /** K3: HTTP POST sink — each partition posts its rows as JSON-array
    * batches (the reference POSTs `to_json(orient="records")` payloads,
    * main.py:31-76, send_dbd_company_supplier.py:85-144; server-side bulk
    * insert chunks at 1000, PublicApiController.php:392-408).
    *
    * The transport is pluggable — `(url, jsonArrayBody) => status` — so the
    * sink is unit-testable offline and a deployment passes a real
    * java.net.http-based function. Rows stream per partition (no driver
    * collect); returns (okRows, failedRows) via accumulators, counting a
    * batch failed when the transport returns a non-2xx status. */
  def postJsonBatches(df: DataFrame, url: String,
                      transport: (String, String) => Int,
                      batchSize: Int = 1000): (Long, Long) = {
    val ok = df.sparkSession.sparkContext.longAccumulator("http_sink_ok")
    val failed = df.sparkSession.sparkContext.longAccumulator("http_sink_failed")
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchSize).foreach { batch =>
        val status = transport(url, batch.mkString("[", ",", "]"))
        if (status >= 200 && status < 300) ok.add(batch.size.toLong)
        else failed.add(batch.size.toLong)
      }
    }
    (ok.value, failed.value)
  }

  /** K6 relational spelling: JDBC batch insert — the reference's
    * `updateOrCreate` loops become one batched `df.write.jdbc`
    * (ImportInvoiceReport.php:199-257 inserts row-by-row inside a
    * transaction; Spark executes per-partition prepared-statement batches
    * of `batchSize`). MERGE-by-key against an existing table composes as
    * `Merge.upsert` → `writeJdbc(SaveMode.Overwrite)`. Exercised offline
    * against embedded Derby (SinksSpec round-trip) — the same wiring
    * drives MySQL with the URL/driver swapped. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                driver: String, batchSize: Int = 1000,
                mode: SaveMode = SaveMode.Append): Unit = {
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    df.write.mode(mode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
  }

  /** F6 reject channel: valid rows to the main table, rejects (with their
    * rule names) to a side path — the bulk equivalent of the reference's
    * per-row error taxonomy + `--dump-fail` files
    * (ImportInvoiceReport.php:199-291). The (validCount, rejectCount)
    * summary rides the write passes themselves via `observe` — no
    * re-reading of either output, zero extra scans. */
  def writeWithRejects(valid: DataFrame, rejects: DataFrame,
                       mainPath: String, rejectPath: String): (Long, Long) = {
    val obsValid  = org.apache.spark.sql.Observation()
    val obsReject = org.apache.spark.sql.Observation()
    valid.observe(obsValid, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(mainPath)
    rejects.withColumn("_failed_rules",
        concat_ws(",", col("_failed_rules")))
      .observe(obsReject, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).json(rejectPath)
    (obsValid.get("n").asInstanceOf[Long],
      obsReject.get("n").asInstanceOf[Long])
  }
}
