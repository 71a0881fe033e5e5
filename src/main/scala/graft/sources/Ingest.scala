package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion readers for hostile sources (SURVEY.md §2.1).
  *
  * All readers ingest permissively (every cell a string) and leave
  * canonicalization to the cleanse layer — schemas are never inferred from
  * dirty data (SURVEY §7.4.5). */
object Ingest {

  /** S1: CSV read with encoding fallback — try encodings in order until one
    * round-trips without replacement characters
    * (read_po_csv_to_json.py:38-44 tries utf-8-sig, utf-8, cp874, tis-620,
    * latin1). Spark won't retry encodings natively, so the probe reads a
    * sample of raw bytes per candidate on the driver (cheap — bytes stream
    * once), then the winning encoding drives the distributed read. */
  val defaultEncodings: Seq[String] = Seq("UTF-8", "x-windows-874", "TIS-620", "ISO-8859-1")

  /** Drop a possibly-split trailing multi-byte char (UTF-8 continuations
    * 10xxxxxx + their lead) from a truncated sample, so the cut itself
    * can't fail the probe. */
  private def trimSplitTail(buf: Array[Byte]): Array[Byte] = {
    var end = buf.length
    while (end > 0 && (buf(end - 1) & 0xC0) == 0x80) end -= 1
    if (end > 0 && (buf(end - 1) & 0xC0) == 0xC0) end -= 1
    java.util.Arrays.copyOf(buf, end)
  }

  /** Pick the first candidate that decodes `sample` cleanly. Shared by the
    * driver-side single-file probe and the per-task many-files path. */
  def detectEncodingFromBytes(sample: Array[Byte],
                              encodings: Seq[String] = defaultEncodings): String =
    encodings.find { enc =>
      try {
        val cs = java.nio.charset.Charset.forName(enc)
        val dec = cs.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        dec.decode(java.nio.ByteBuffer.wrap(sample))
        true
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    }.getOrElse("ISO-8859-1") // latin1 accepts any byte sequence — last resort

  /** First 64 KB of a file through the Hadoop filesystem API — a bounded
    * seekable read for any supported scheme (file:, hdfs:, s3a:, …), never
    * a whole-file driver read; a split trailing multi-byte char is trimmed
    * so the cut itself can't fail an encoding probe. */
  def sampleBytes(path: String,
                  conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen
      val want = math.min(len, 64L * 1024).toInt
      var buf = new Array[Byte](want)
      in.readFully(0, buf)
      if (want.toLong < len) buf = trimSplitTail(buf)
      buf
    } finally in.close()
  }

  /** Probe a file's encoding from its first 64 KB only. */
  def detectEncoding(path: String, encodings: Seq[String] = defaultEncodings,
                     conf: org.apache.hadoop.conf.Configuration =
                       new org.apache.hadoop.conf.Configuration()): String =
    detectEncodingFromBytes(sampleBytes(path, conf), encodings)

  /** Charsets Spark's CSV reader accepts natively; anything else (cp874,
    * TIS-620, …) goes through the transcode path. */
  private val sparkNativeCharsets =
    Set("UTF-8", "US-ASCII", "ISO-8859-1", "UTF-16", "UTF-16BE", "UTF-16LE", "UTF-32")

  /** Excel-on-Windows writes UTF-8 CSVs with a BOM; the reference's first
    * candidate is `utf-8-sig` (read_po_csv_to_json.py:39), whose whole
    * point is stripping it. A kept BOM corrupts the first header cell
    * (`"<BOM>PO No."` never matches a named-column lookup). */
  def hasUtf8Bom(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
      (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF

  private def stripBomChar(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s

  /** Read a CSV with encoding fallback; all columns string, no header
    * promotion (that happens grid-side).
    *
    * Thai charsets are outside Spark's CSV whitelist, so those files are
    * decoded from raw bytes (`binaryFiles` — each file one task, parallel
    * across files at scale) and parsed via `csv(Dataset[String])`; a
    * BOM-carrying UTF-8 file takes the same path so the BOM strips
    * (the utf-8-sig semantics). */
  def csvWithEncodingFallback(spark: SparkSession, path: String,
                              encodings: Seq[String] = defaultEncodings): DataFrame = {
    // session hadoop conf: credentials/settings for s3a/hdfs reach the probe
    val sample = sampleBytes(path, spark.sparkContext.hadoopConfiguration)
    val enc = detectEncodingFromBytes(sample, encodings)
    if (sparkNativeCharsets(enc.toUpperCase) && !hasUtf8Bom(sample)) {
      spark.read
        .option("header", "false")
        .option("encoding", enc)
        .option("inferSchema", "false")
        .csv(path)
    } else {
      import spark.implicits._
      val lines = spark.sparkContext.binaryFiles(path)
        .flatMap { case (_, pds) =>
          stripBomChar(
            new String(pds.toArray(), java.nio.charset.Charset.forName(enc)))
            .split("\r?\n", -1).iterator
        }
      spark.read
        .option("header", "false")
        .option("inferSchema", "false")
        .csv(spark.createDataset(lines))
    }
  }

  /** S1 at scale — MANY files, each with its own unknown encoding: the
    * probe and the decode both run inside the file's own `binaryFiles`
    * task (first 64 KB picks the charset, the payload decodes in place) —
    * no driver-side per-file work at all. Returns (source_file, encoding,
    * line) so downstream keeps file lineage; feed the `line` column to
    * `spark.read.csv(Dataset[String])` per the single-file reader. */
  def csvLinesPerFileEncoding(spark: SparkSession, pathGlob: String,
                              encodings: Seq[String] = defaultEncodings): DataFrame = {
    val encs = encodings // avoid closing over `this`
    val rows = spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, pds) =>
        val bytes = pds.toArray()
        val sample =
          if (bytes.length <= 64 * 1024) bytes
          else trimSplitTail(java.util.Arrays.copyOf(bytes, 64 * 1024))
        val enc = detectEncodingFromBytes(sample, encs)
        val text = new String(bytes, java.nio.charset.Charset.forName(enc))
        // utf-8-sig semantics: a leading BOM never reaches the first cell
        (if (text.nonEmpty && text.charAt(0) == '\uFEFF') text.substring(1)
         else text)
          .split("\r?\n", -1).iterator.zipWithIndex
          .map { case (line, i) => Row(file, enc, i.toLong, line) }
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("source_file", StringType, nullable = false),
      StructField("encoding", StringType, nullable = false),
      StructField("line_no", LongType, nullable = false),
      StructField("line", StringType, nullable = true))))
  }

  /** S10: streaming JSON scan with a JSON-pointer-style sub-array
    * (`/records`), as the importers do with JsonMachine
    * (ImportInvoiceReport.php:70-79). Spark's multiLine JSON scan is already
    * streaming/partitioned; the pointer becomes explode(records). */
  def jsonPointer(spark: SparkSession, path: String, pointer: String): DataFrame = {
    val field = pointer.stripPrefix("/")
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col(field)).as("r"))
      .select(col("r.*"))
  }

  /** C44 ragged-row pad/truncate (`normalize_columns`,
    * pdf_ocr_sale_invoice_to_json.py:96-106): every row is brought to the
    * common width = max(header length, widest row) — shorter rows pad with
    * "", longer rows slice (the reference's truncate branch; unreachable
    * for data rows since the width maximum covers them, live for headers).
    * Absent headers become synthetic `col_1..col_n`. Width is one tiny
    * aggregate; the normalization itself is a pure array projection.
    * Returns (column names, normalized grid). */
  def padTruncate(gridDf: DataFrame,
                  header: Option[Seq[String]] = None): (Seq[String], DataFrame) = {
    val widest = gridDf.agg(max(size(col("cells")))).first().getInt(0)
    val width = math.max(header.map(_.length).getOrElse(0), widest)
    val names = header match {
      case Some(h) => h.padTo(width, "").take(width)
      case None    => (1 to width).map(i => s"col_$i")
    }
    val normalized = gridDf.withColumn("cells",
      slice(concat(col("cells"),
        array_repeat(lit(""), lit(width))), 1, width))
    (names, normalized)
  }

  /** Incremental-ingestion ledger: the current file inventory under
    * `path` (name, size, content md5 — computed inside each file's own
    * `binaryFile` task, the C48 envelope distributed) full-outer-joined
    * against the previous run's manifest, classifying every file as
    * new / changed / unchanged / deleted. Feeding only the new+changed
    * set into a pipeline makes re-runs incremental and idempotent — the
    * engine-side spelling of the reference's md5+metadata capture
    * (`pdf_ocr_dbd_to_json.py:97-103,445-456`), which exists precisely
    * so re-processing can recognize files it has already seen.
    *
    * Scale shape: the exchange carries one (name, size, md5) row per
    * FILE — inventory-sized, never content-sized; content bytes never
    * leave the scan task that hashes them. */
  def deltaFiles(spark: SparkSession, path: String,
                 manifest: DataFrame): DataFrame = {
    val inv = spark.read.format("binaryFile").load(path)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length").as("size_bytes"),
        md5(col("content")).as("file_md5"))
    inv.join(manifest.select(col("file_name"), col("md5").as("__prev")),
        Seq("file_name"), "full_outer")
      .select(col("file_name"), col("size_bytes"), col("file_md5"),
        when(col("__prev").isNull, lit("new"))
          .when(col("file_md5").isNull, lit("deleted"))
          .when(col("file_md5") === col("__prev"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

}
