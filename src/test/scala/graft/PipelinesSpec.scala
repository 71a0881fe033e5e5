package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Pipelines
import graft.sources.Ingest

class PipelinesSpec extends SparkSpec {

  val fixtures = "/root/repo/src/test/resources/fixtures"

  test("encoding detection picks TIS-620 for the Thai PO grid") {
    val enc = Ingest.detectEncoding(s"$fixtures/po_report.csv")
    // per-file distributed variant: mixed encodings in one glob, each file
    // probed and decoded inside its own task
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft_enc")
      val thai = "รหัส,จำนวน\nก,1"
      java.nio.file.Files.write(dir.resolve("utf8.csv"),
        thai.getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("tis620.csv"),
        thai.getBytes("x-windows-874"))
      val lines = Ingest.csvLinesPerFileEncoding(spark, s"$dir/*.csv")
        .where(col("line_no") === 0)
      val byFile = lines.collect().groupBy(r => r.getString(0).split('/').last)
      assert(byFile("utf8.csv").head.getString(1) == "UTF-8")
      assert(byFile("tis620.csv").head.getString(1) != "UTF-8")
      assert(byFile.values.forall(_.head.getString(3) == "รหัส,จำนวน"))
    }
    assert(enc == "x-windows-874" || enc == "TIS-620")
  }

  test("utf-8-sig: a leading BOM never reaches the first cell (both read paths)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bom")
    val content = "PO No.,จำนวน\nA1,10"
    java.nio.file.Files.write(dir.resolve("bom.csv"),
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ content.getBytes("UTF-8"))
    // many-files path: BOM stripped inside the task
    val line0 = Ingest.csvLinesPerFileEncoding(spark, s"$dir/*.csv")
      .where(col("line_no") === 0).collect()(0).getString(3)
    assert(line0 == "PO No.,จำนวน", s"got <$line0>")
    // single-file path: BOM-carrying UTF-8 routes through the transcode
    // branch so the first header cell is clean
    val first = Ingest.csvWithEncodingFallback(spark, s"$dir/bom.csv")
      .collect()(0).getString(0)
    assert(first == "PO No.", s"got <$first>")
  }

  test("po pipeline: embedded header dropped, trailing junk trimmed, Thai decoded") {
    val df = Pipelines.poCsv(spark, s"$fixtures/po_report.csv")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("po_no")).toSeq ==
      Seq("1013090869", "1013090870", "1013090871"))
    assert(rows(0).getAs[String]("supplier_name") == "ผู้ขาย หนึ่ง")
    assert(rows(0).getAs[String]("buyer_code") == "2050363000123")
  }

  test("invoice pipeline: 2 valid + 1 reject, header row gone") {
    val (valid, rejects) = Pipelines.invoiceReport(spark, s"$fixtures/invoice_records.json")
    assert(valid.count() == 2 && rejects.count() == 1)
    val names = valid.select("invoice_no").collect().map(_.getString(0)).toSet
    assert(names == Set("BL12034", "IV516"))
  }

  test("remittance pipeline: dedup across pages, totals reconcile to zero") {
    val (tx, totals) = Pipelines.remittance(spark, s"$fixtures/rm_pages.json")
    assert(tx.count() == 4 && totals.count() == 2)
    val rec = Pipelines.remittanceReconcile(spark, s"$fixtures/rm_pages.json")
    assert(rec.where(col("diff") =!= 0).count() == 0)
  }

  test("dbd financial pipeline: upsert keeps unmatched, updates matched") {
    import spark.implicits._
    val existing = Seq(("0105537086874", 2021, Some(1.0), Some(2.0), Some(3.0)))
      .toDF("tax_id", "fiscal_year", "total_revenue", "cost_of_goods_sold", "net_profit")
    val out = Pipelines.dbdFinancial(spark, s"$fixtures/dbd_financial.json", existing)
    assert(out.count() == 4)
    val y2021 = out.where(col("fiscal_year") === 2021).collect()(0)
    assert(y2021.getAs[Double]("total_revenue") == 1.0) // untouched
  }

  test("item map: exact, paren-stripped, contains fallback, unknown") {
    import spark.implicits._
    val got = Seq("รายได้รวม", "กำไรสุทธิ", "xyz").toDF("th")
      .select(Pipelines.mapItemTh(col("th"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("total_revenue", "net_profit", "unknown"))
  }
}
