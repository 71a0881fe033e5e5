package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ANSI-mode totality of the cleansing DSL.
  *
  * The DSL's documented contract is "malformed → null" (SURVEY §7.4
  * parser-contract note: totality is a deliberate deviation from the
  * reference, which raises). Every in-repo session pins
  * `spark.sql.ansi.enabled=false`, but Spark 4 DEFAULTS it true for
  * adopters — and under ANSI, `cast` of a malformed string and
  * `element_at` past the end THROW instead of returning null, so a
  * function that is total in our sessions can crash an adopter's job on
  * the first dirty row (exactly how the round-11 migration smoke caught
  * poCsv). This spec feeds an adversarial input set through every
  * public cleansing Column function under BOTH modes and pins
  * (a) no exception and (b) bit-identical outputs — ANSI must be
  * invisible to the DSL. */
class AnsiTotalitySpec extends SparkSpec {
  import graft.functions.{Money, OcrRepair, SaleReports, TextClean, ThaiDates}

  // dirty-row zoo: empty/blank, garbage, half-matching numerics/dates,
  // multi-dot and double-dash survivors of the money regex cleans, Thai
  // digits/months, overflow-ish, and well-formed witnesses so equality
  // checks cover the happy path too
  private val inputs: Seq[String] = Seq(
    null, "", " ", "-", "--", ".", "-.", "..", "garbage", "NaN",
    "Infinity", "1e309", "1.2.3", "1,2,3.4.5", "1..2", "9-9-9",
    "abc - def", "1 - 2", "12.5 - abc", "- 7", "7 -",
    "1,234.56", "99,999.999", "(1,000.00)", "45%", "12%34",
    "01/02/2567", "12/34/5678", "99/99/9999", "1/2/3", "01/02",
    "12/31/2024", "12/31/2024 13:45:00", "12/31/2024 1:45:00 PM",
    "31 ธันวาคม 2567", "32 ธันวาคม 2567", "ธันวาคม", "๑๒๓",
    "44927", "44927.5", "abc44927", "99999999999999999999",
    "9999999999.12.2567", "1.1.99999999999", "99999999999/01/01",
    "01/01/99999999999", "31 ธันวาคม 99999999999",
    "0105537086874", "105537086874", "12345", "1234567890123x",
    "INV-001.0", "PO123.0", ".0", "x.0",
    "รวมทั้งสิ้น 1,000", "นาย สมชาย ใจดี", "นางสาว", "  a  b  ",
    "O0Il1 B8", "สาขา 00001", "CD-FRESH-001", "ABC/123-456")

  private def fns: Seq[(String, Column => Column)] = Seq(
    "ThaiDates.parseFlexibleDate" -> ThaiDates.parseFlexibleDate _,
    "ThaiDates.parseFlexibleTimestamp" -> ThaiDates.parseFlexibleTimestamp _,
    "ThaiDates.strictDmySlash" -> ThaiDates.strictDmySlash _,
    "ThaiDates.parseUsDate" -> ThaiDates.parseUsDate _,
    "ThaiDates.parseUsTimestamp" -> ThaiDates.parseUsTimestamp _,
    "ThaiDates.excelSerialToDate" -> ((c: Column) => ThaiDates.excelSerialToDate(c)),
    "Money.parseAmount" -> Money.parseAmount _,
    "Money.parseAmountRobust" -> Money.parseAmountRobust _,
    "Money.parseAmountMultiSep" -> Money.parseAmountMultiSep _,
    "Money.dashToZeroNullable" -> Money.dashToZeroNullable _,
    "Money.dashToZeroTotal" -> Money.dashToZeroTotal _,
    "Money.percentValue" -> Money.percentValue _,
    "Money.coerceNumericZeroFill" -> Money.coerceNumericZeroFill _,
    "Money.rangeSplit" -> ((c: Column) => to_json(Money.rangeSplit(c))),
    "TextClean.normWs" -> TextClean.normWs _,
    "TextClean.stripInvisible" -> TextClean.stripInvisible _,
    "TextClean.nullIfBlank" -> TextClean.nullIfBlank _,
    "TextClean.normalizeTaxId" -> TextClean.normalizeTaxId _,
    "TextClean.thaiIdCheckDigitValid" ->
      ((c: Column) => TextClean.thaiIdCheckDigitValid(c).cast("string")),
    "TextClean.stripDotZero" -> TextClean.stripDotZero _,
    "TextClean.poTail" -> TextClean.poTail _,
    "TextClean.rejoinCombiningMarks" -> TextClean.rejoinCombiningMarks _,
    "TextClean.firstNumber" -> TextClean.firstNumber _,
    "TextClean.splitThaiName" -> ((c: Column) => to_json(TextClean.splitThaiName(c))),
    "TextClean.splitThaiNameControllerVariant" ->
      ((c: Column) => to_json(TextClean.splitThaiNameControllerVariant(c))),
    "OcrRepair.repairTailLookalikes" -> OcrRepair.repairTailLookalikes _,
    "OcrRepair.repairGlobalLookalikes" -> OcrRepair.repairGlobalLookalikes _,
    "OcrRepair.normalizeBranchCode" -> OcrRepair.normalizeBranchCode _,
    "OcrRepair.normalizeDocRef" -> OcrRepair.normalizeDocRef _,
    "OcrRepair.bestToken" -> OcrRepair.bestToken _,
    "OcrRepair.canonicalizeCrossdock" -> OcrRepair.canonicalizeCrossdock _,
    "OcrRepair.commonPrefixLen(self)" ->
      ((c: Column) => OcrRepair.commonPrefixLen(c, reverse(c)).cast("string")),
    "OcrRepair.repairRefByPrefix(self)" ->
      ((c: Column) => OcrRepair.repairRefByPrefix(c, reverse(c))),
    "SaleReports.topic" -> SaleReports.topic _,
    "SaleReports.startRoundDate" -> SaleReports.startRoundDate _,
    "SaleReports.endRoundDate" -> SaleReports.endRoundDate _,
    "SaleReports.dotDateToIso" -> SaleReports.dotDateToIso _,
    "SaleReports.supplierNum" -> SaleReports.supplierNum _,
    "SaleReports.supplierName" -> SaleReports.supplierName _)

  test("every cleansing Column function is total and ANSI-invisible " +
    "on the dirty-row zoo") {
    import spark.implicits._
    val df = inputs.toDF("s")
    val key = "spark.sql.ansi.enabled"
    def run(ansi: Boolean, name: String, fn: Column => Column): Either[String, Seq[String]] = {
      spark.conf.set(key, ansi)
      try Right(df.select(fn(col("s")).cast("string")).collect()
        .map(r => if (r.isNullAt(0)) "∅" else r.getString(0)).toSeq)
      catch { case t: Throwable => Left(t.toString.take(160)) }
      finally spark.conf.set(key, "false")
    }
    val problems = fns.flatMap { case (name, fn) =>
      (run(ansi = false, name, fn), run(ansi = true, name, fn)) match {
        case (Right(_), Left(err)) =>
          Some(s"$name THROWS under ANSI only: $err")
        case (Left(err), _) =>
          Some(s"$name throws even with ansi off (not an ANSI issue, still a totality bug): $err")
        case (Right(off), Right(on)) if off != on =>
          val i = off.indices.find(i => off(i) != on(i)).get
          Some(s"$name DIVERGES under ANSI at input '${inputs(i)}': off='${off(i)}' on='${on(i)}'")
        case _ => None
      }
    }
    assert(problems.isEmpty,
      s"\n${problems.size} function(s) not ANSI-total:\n  " + problems.mkString("\n  "))
  }
}
