package graft

import org.apache.spark.sql.functions._
import graft.functions._

class CleanseSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  private def onDf(raws: Seq[String])(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    raws.toDF("raw").select(c(col("raw")).as("r")).collect().map(r => r.get(0)).toSeq

  // ---- ThaiDates

  test("beYear shifts Buddhist years at threshold 2400") {
    assert(onDf(Seq("2568", "2025", "2399"))(c => ThaiDates.beYear(c.cast("int"))) ==
      Seq(2025, 2025, 2399))
  }

  test("parseFlexibleDate handles B.E., two-digit years, swaps, invalid") {
    val got = onDf(Seq("01/07/2568", "2025-14-03", "7/1/25", "31/02/2025", "x"))(
      c => ThaiDates.parseFlexibleDate(c).cast("string"))
    assert(got == Seq("2025-07-01", "2025-03-14", "2025-01-07", null, null))
  }

  test("parseFlexibleTimestamp repairs 24h+PM and parses 12h") {
    val got = onDf(Seq("7/10/2025 14:44:07 PM", "7/10/2025 2:44:07 PM"))(
      c => ThaiDates.parseFlexibleTimestamp(c).cast("string"))
    assert(got == Seq("2025-10-07 14:44:07", "2025-10-07 14:44:07"))
  }

  test("excelSerialToDate uses 1899-12-30 epoch") {
    assert(one[java.sql.Date](ThaiDates.excelSerialToDate(lit(45000)).cast("date")).toString
      == "2023-03-15")
  }

  test("parseThaiCardDate parses abbreviated Thai month + B.E. year") {
    assert(one[String](ThaiDates.parseThaiCardDate(lit("15 มี.ค. 2543")).cast("string"))
      == "2000-03-15")
  }

  // ---- Money

  test("parseAmountRobust: parens negative, unicode minus, digit spaces") {
    val got = onDf(Seq("(5,463.04)", "−1 171.37", "1,234.56", "-", ""))(Money.parseAmountRobust)
    assert(got == Seq(-5463.04, -1171.37, 1234.56, null, null))
  }

  test("parseAmountMultiSep resolves ambiguous separators") {
    val got = onDf(Seq("1.234,56", "1,234.56", "1.234.56", "1,234,56", "12,5"))(Money.parseAmountMultiSep)
    assert(got == Seq(1234.56, 1234.56, 1234.56, 1234.56, 12.5))
  }

  test("dash policies differ: income nullable vs balance zero-fill") {
    assert(onDf(Seq("-", "junk"))(Money.dashToZeroNullable) == Seq(0.0, null))
    assert(onDf(Seq("-", "junk"))(Money.dashToZeroTotal) == Seq(0.0, 0.0))
  }

  test("percentValue keeps magnitude; rangeSplit splits bounds") {
    assert(one[Double](Money.percentValue(lit("12.3%"))) == 12.3)
    val r = Seq("1.5 - 2.5").toDF("raw")
      .select(Money.rangeSplit(col("raw")).as("r")).select("r.start", "r.end")
      .collect()(0)
    assert(r.getDouble(0) == 1.5 && r.getDouble(1) == 2.5)
  }

  test("deriveExclVat only when excl is 0/null") {
    val df = Seq((0.0, 107.0, 7.0), (50.0, 107.0, 7.0)).toDF("e", "i", "v")
    val got = df.select(Money.deriveExclVat(col("e"), col("i"), col("v"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(100.0, 50.0))
  }

  // ---- TextClean

  test("normWs + stripInvisible + nullIfBlank") {
    assert(one[String](TextClean.normWs(lit("a\n b\t\tc"))) == "a b c")
    assert(one[String](TextClean.stripInvisible(lit("a​b c（d）"))) == "abc(d)")
    assert(onDf(Seq(" ? ", "", "x"))(TextClean.nullIfBlank) == Seq(null, null, "x"))
  }

  test("normalizeTaxId pads/truncates to 13 digits") {
    assert(onDf(Seq("1-2345-67890-12-3", "98765", "12345678901234567"))(TextClean.normalizeTaxId)
      == Seq("1234567890123", "0000000098765", "5678901234567"))
  }

  test("uniquifyHeaders numbers duplicates") {
    assert(TextClean.uniquifyHeaders(Seq("a", "b", "a", "a")) == Seq("a", "b", "a_2", "a_3"))
  }

  test("splitThaiName peels honorific (นางสาว before นาง)") {
    val df = Seq("นางสาวสมหญิง ใจดี", "Mr. John Smith").toDF("raw")
      .select(TextClean.splitThaiName(col("raw")).as("n"))
      .select("n.title", "n.first_name", "n.last_name")
    val rows = df.collect()
    assert(rows(0).getString(0) == "นางสาว" && rows(0).getString(1) == "สมหญิง"
      && rows(0).getString(2) == "ใจดี")
    assert(rows(1).getString(0) == "Mr." && rows(1).getString(1) == "John")
  }

  test("C31 controller variant mis-handles นางสาว exactly like the reference") {
    val df = Seq("นางสาวสมหญิง ใจดี").toDF("raw").select(
      TextClean.splitThaiName(col("raw")).as("good"),
      TextClean.splitThaiNameControllerVariant(col("raw")).as("buggy"))
    val r = df.select("good.title", "buggy.title", "buggy.first_name").collect()(0)
    assert(r.getString(0) == "นางสาว")
    assert(r.getString(1) == "นาง")          // นาง matches first...
    assert(r.getString(2) == "สาวสมหญิง")    // ...and สาว fuses into the name
  }

  test("rm key-map variants swap doc/transfer dates as the importers do") {
    import graft.pipelines.Pipelines
    assert(Pipelines.rmReportKeyMap("วันที่") == "doc_date")
    assert(Pipelines.remAdviceKeyMap("วันที่") == "transfer_date")
    val df = Seq(("2025-01-01", "2025-01-02")).toDF("วันที่", "วันที่เอกสาร")
    assert(Pipelines.renameRemittanceKeys(df, Pipelines.rmReportKeyMap)
      .columns.toSeq == Seq("doc_date", "transfer_date"))
    assert(Pipelines.renameRemittanceKeys(df, Pipelines.remAdviceKeyMap)
      .columns.toSeq == Seq("transfer_date", "doc_date"))
  }

  test("poTail extracts 8-14 digit run") {
    assert(onDf(Seq("PO:1013090869", "no digits"))(TextClean.poTail)
      == Seq("1013090869", null))
  }

  // ---- OcrRepair

  test("repairTailLookalikes fixes only after letter prefix") {
    assert(one[String](OcrRepair.repairTailLookalikes(lit("bl12O3l"))) == "BL12031")
  }

  test("repairGlobalLookalikes maps O→0, I→1") {
    assert(one[String](OcrRepair.repairGlobalLookalikes(lit("Iv6O"))) == "1V60")
  }

  test("normalizeBranchCode cascade") {
    assert(onDf(Seq("x0000y", "FC 7", "FC 42", "W123", "a-b1"))(OcrRepair.normalizeBranchCode)
      == Seq("0000", "FC07", "FC42", "W123", "AB1"))
  }

  test("normalizeDocRef CONSIGN variants and 1V prefix") {
    assert(onDf(Seq("C0NS1GN-00", "C0NS1GN", "1V68071"))(OcrRepair.normalizeDocRef)
      == Seq("CONSIGN-00", "CONSIGN", "IV68071"))
  }

  test("bestToken picks longest candidate, repaired") {
    assert(one[String](OcrRepair.bestToken(lit("เน xx 1NV68071 ab12"))) == "1NV68071")
  }

  test("commonPrefixLen + repairRefByPrefix") {
    val df = Seq(("INV12345-A", "INV12345"), ("ABC", "XYZ")).toDF("doc", "ref")
    val got = df.select(OcrRepair.commonPrefixLen(col("doc"), col("ref"))).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(8, 0))
    val rep = df.select(OcrRepair.repairRefByPrefix(col("doc"), col("ref"))).collect().map(_.getString(0))
    assert(rep.toSeq == Seq("INV12345-A", "XYZ"))
  }

  test("two-digit-year policy B forces 20yy always") {
    assert(one[Int](ThaiDates.expandYyAlways20(lit(68))) == 2068)
    assert(one[Int](ThaiDates.expandYy(lit(68))) == 1968) // policy A differs
  }

  test("thaiMonthNum resolves full names and OCR abbreviations") {
    assert(onDf(Seq("มกราคม", "ธ.ค.", "nonsense"))(ThaiDates.thaiMonthNum)
      == Seq(1, 12, null))
  }

  test("money rounding: 2dp money, 3dp quantities") {
    assert(one[Double](Money.money2(lit(1.2345))) == 1.23)
    assert(one[Double](Money.qty3(lit(1.23456))) == 1.235)
  }

  test("coerceNumericZeroFill falls through cast → robust parse → 0") {
    assert(onDf(Seq("12.5", "1,000", "junk"))(Money.coerceNumericZeroFill)
      == Seq(12.5, 1000.0, 0.0))
  }

  test("stripDotZero removes trailing .0 runs only") {
    assert(onDf(Seq("IV123.000", "IV123.5"))(TextClean.stripDotZero)
      == Seq("IV123", "IV123.5"))
  }

  test("noise-label filter matches fixed set and prefixes") {
    import graft.operators.RowFilters
    val got = Seq("หน่วย : บาท", "หมายเหตุ something", "รายได้รวม")
      .toDF("l").select(RowFilters.isNoiseLabel(col("l"))).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, true, false))
  }

  test("rejoinCombiningMarks re-attaches split Thai marks") {
    assert(one[String](TextClean.rejoinCombiningMarks(lit("กา ้ว"))) == "กา้ว")
  }

  test("firstNumber extracts the first number from glued cells") {
    assert(onDf(Seq("total 1,234.50 of 2", "12.5อะไร", "no digits"))(TextClean.firstNumber)
      == Seq(1234.5, 12.5, null))
  }

  test("canonicalizeCrossdock maps variants") {
    val got = Seq("CROSS DOCK", "other").toDF("raw")
      .select(OcrRepair.canonicalizeCrossdock(col("raw")).as("c"))
      .select("c.code", "c.label").collect()
    assert(got(0).getString(0) == "CROSS DOCK" && got(0).getString(1) == "Crossdock")
    assert(got(1).getString(0) == "other")
  }

  test("splitCsvLine: quoted delimiters, escaped quotes, trailing empties") {
    import graft.plans.CsvExpressions
    val cases = Seq(
      "a,\"1,234.56\",c"             -> Seq("a", "1,234.56", "c"),
      "x,\"he said \"\"hi\"\"\",z"   -> Seq("x", "he said \"hi\"", "z"),
      "a,,c,"                        -> Seq("a", "", "c", ""),
      "plain"                        -> Seq("plain"),
      "\"only\""                     -> Seq("only"))
    val got = cases.map(_._1).toDF("line")
      .select(CsvExpressions.splitCsvLine(col("line")).as("cells"))
      .collect().map(_.getSeq[String](0).toList)
    cases.map(_._2).zip(got).foreach { case (want, g) =>
      assert(g == want.toList, s"want $want got $g")
    }
  }

  test("thaiIdCheckDigitValid: mod-11 check digit, malformed inputs") {
    import graft.functions.TextClean
    // 123456789012 → weighted sum 352 = 32·11 → check (11-0)%10 = 1
    val cases = Seq(
      ("1234567890121", true),
      ("1234567890122", false),  // wrong check digit
      ("1234567890120", false),
      ("123456789012", false),   // 12 digits
      ("12345678901211", false), // 14 digits
      ("12345678901a1", false),  // non-digit
      ("", false), (null: String, false))
    val got = cases.map(_._1).toDF("id")
      .select(TextClean.thaiIdCheckDigitValid(col("id")).as("v"))
      .collect().map(_.getBoolean(0)).toList
    assert(got == cases.map(_._2).toList)
  }
}
