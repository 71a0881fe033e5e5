package graft.core

import org.apache.spark.sql.DataFrame

/** Guard against parquet row-group starvation of scan-stage parallelism.
  *
  * Parquet assigns every row of a row group to the byte-range split
  * containing the group's midpoint, so a table written as few large row
  * groups caps the width of any stage fused onto its scan REGARDLESS of
  * `spark.sql.files.maxPartitionBytes` — the planner happily makes 19
  * splits of a one-row-group file and 18 of them carry zero rows. For
  * exchange-bound operators this costs only the (cheap) scan; for the
  * gram-dense dedup family, whose tokenize/shingle/minhash/md5 work is
  * deliberately fused into the scan stage, it serializes the whole
  * corpus pass: measured on a 74 MB single-row-group documents table at
  * sf10, q124's probe stage ran 19 tasks with stage wall = summed task
  * time (95 s, concurrency 1.0 on local[32]); the same stage on a
  * 32-file layout ran at concurrency 28.3 (14.8 s).
  *
  * Spark cannot see row-group boundaries at planning time and no
  * session conf splits within a row group, so the only in-engine remedy
  * is an explicit repartition — worth one exchange of the raw text
  * exactly when the layout is provably starved, and a no-op otherwise.
  * Detection is bounded: row-group counts come from parquet footers,
  * read only when the file count is already below the target width
  * (so at most `width − 1` footer reads, metadata-only).
  */
object ScanWidth {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `df`, repartitioned to the default parallelism iff its file layout
    * provably caps scan width below half of it. Non-file inputs
    * (in-memory test frames, cached-only plans) and unreadable/
    * non-parquet files pass through untouched — when the layout can't
    * be judged, the engine doesn't shuffle on suspicion. */
  def ensure(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) df
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      val groups = files.iterator.map { f =>
        scala.util.Try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size() finally r.close()
        // unreadable or non-parquet (csv/json split by bytes) => treat
        // as splittable so the sum clears the threshold
        }.getOrElse(target)
      }.sum
      if (groups >= math.max(1, target / 2)) df
      else {
        log.info(s"ScanWidth: ${files.length} file(s) / $groups row " +
          s"group(s) cap the scan below $target-way — repartitioning " +
          "(one exchange of the input, cheaper than a serialized scan stage)")
        df.repartition(target)
      }
    }
  }
}
