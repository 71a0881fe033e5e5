package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Generic string hygiene (SURVEY.md §2.7 C20-C22, C37-C41). */
object TextClean {

  /** C20 whitespace normalize: newlines → space, collapse runs, trim
    * (pdf_ocr_inv_to_json.py:56-57). */
  def normWs(c: Column): Column =
    trim(regexp_replace(c.cast("string"), "\\s+", " "))

  /** C21 invisible-char strip: zero-width chars, NBSP; fullwidth parens →
    * ASCII (script_read_dbd_income.py:131-143, PublicApiController.php:713-715). */
  def stripInvisible(c: Column): Column = {
    val zw = regexp_replace(c.cast("string"), "[\\u200b\\u200c\\u200d\\ufeff\\u00a0]", "")
    translate(zw, "（）", "()")
  }

  /** C22 null-if-empty-or-`?` (BolApiController.php:415-420). */
  def nullIfBlank(c: Column): Column = {
    val t = trim(stripInvisible(c))
    when(t.isin("", "?"), lit(null).cast("string")).otherwise(t)
  }

  /** C37 tax-id normalize: digits only, keep last 13, left-pad to 13 with 0
    * (ImportDbdFinancial.php:149-154). */
  def normalizeTaxId(c: Column): Column = {
    val digits = regexp_replace(c.cast("string"), "\\D", "")
    val last13 = when(length(digits) > 13, substring(digits, -13, 13)).otherwise(digits)
    when(length(last13) === 0, lit(null).cast("string"))
      .otherwise(lpad(last13, 13, "0"))
  }

  /** Thai 13-digit ID mod-11 check-digit validation (citizen and
    * corporate tax IDs share the scheme the reference's tax-id columns
    * carry — `normalizeTaxId` shapes them, this validates them):
    * `check = (11 - Σ_{i=1..12} d_i·(14-i) mod 11) mod 10` must equal
    * `d_13`. False for anything not exactly 13 digits; null input →
    * false. Pure column arithmetic — codegen-friendly, no UDF. */
  def thaiIdCheckDigitValid(c: Column): Column = {
    val s = trim(c.cast("string"))
    val wellFormed = s.rlike("^[0-9]{13}$")
    val weighted = (1 to 12).map(i =>
      substring(s, i, 1).cast("int") * lit(14 - i)).reduce(_ + _)
    val check = pmod(lit(11) - pmod(weighted, lit(11)), lit(10))
    coalesce(when(wellFormed, check === substring(s, 13, 1).cast("int")),
      lit(false))
  }

  /** C38 `.0` suffix strip on reference docs
    * (ImportSaleInvoiceReport.php:125-134). */
  def stripDotZero(c: Column): Column =
    regexp_replace(c.cast("string"), "\\.0+$", "")

  /** C30 PO-number tail extraction: 8-14 digit run out of `PO:1013090869`
    * (pdf_ocr_inv_to_json.py:223-227). Null if absent. */
  def poTail(c: Column): Column = {
    val hit = regexp_extract(c.cast("string"), "(\\d{8,14})", 1)
    when(hit === "", lit(null).cast("string")).otherwise(hit)
  }

  /** C39: rejoin Thai combining marks split from their base character by a
    * line break or stray space (OCR artifact): drop whitespace that sits
    * immediately before a combining vowel/tone mark
    * (pdf_ocr_dbd_to_json.py:89-94). */
  def rejoinCombiningMarks(c: Column): Column =
    regexp_replace(c.cast("string"),
      "\\s+(?=[\\u0E31\\u0E33-\\u0E3A\\u0E47-\\u0E4E])", "")

  /** C43: glued-number / embedded-total cell repair — take the FIRST number
    * in a cell that contains prose or two run-together numbers
    * (pdf_ocr_sale_invoice_to_json.py:112-120). */
  def firstNumber(c: Column): Column = {
    val hit = regexp_extract(c.cast("string"), "([0-9][0-9,]*(?:\\.\\d+)?)", 1)
    when(hit === "", lit(null).cast("double"))
      .otherwise(graft.functions.Money.parseAmountRobust(hit))
  }

  /** C40 header uniquify — driver-side schema repair before `toDF(names)`:
    * duplicate header names become `name_2`, `name_3`, …
    * (read_po_csv_to_json.py:198-208). */
  def uniquifyHeaders(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val k = seen.getOrElse(n, 0) + 1
      seen(n) = k
      if (k == 1) n else s"${n}_$k"
    }
  }

  /** Thai honorific name split (C31): strip invisibles, peel an honorific
    * prefix, split the rest on the first space → struct(title, first, last).
    * Order of alternation matters — `นางสาว` must precede `นาง`
    * (BolApiController.php:490-506; the PublicApiController.php:719-735
    * variant has them reversed and thus never matches `นางสาว` — we keep the
    * correct order and note the variant). */
  def splitThaiName(c: Column): Column =
    splitThaiNameWith(c, Seq("นางสาว", "นาย", "นาง", "ดร\\.", "ผศ\\.ดร\\.",
      "Mr\\.", "Mrs\\.", "Ms\\."))

  /** C31 variant B — the PublicApiController.php:719-735 honorific order,
    * where `นาง` precedes `นางสาว` in the alternation so `นางสาว` never
    * matches as a unit (title = `นาง`, the `สาว` residue fuses into the
    * first name). Preserved as a named variant per SURVEY §7.4.3: the
    * survey's map is the contract; inconsistencies are replicated
    * per-pipeline, not silently "fixed". */
  def splitThaiNameControllerVariant(c: Column): Column =
    splitThaiNameWith(c, Seq("นาย", "นาง", "นางสาว", "ดร\\.", "ผศ\\.ดร\\.",
      "Mr\\.", "Mrs\\.", "Ms\\."))

  private def splitThaiNameWith(c: Column, honorifics: Seq[String]): Column = {
    val s = normWs(stripInvisible(c))
    val pat = s"^(${honorifics.mkString("|")})\\s*(.*)$$"
    val title = regexp_extract(s, pat, 1)
    val rest  = when(title =!= "", regexp_extract(s, pat, 2)).otherwise(s)
    val parts = split(trim(rest), "\\s+", 2)
    struct(
      when(title === "", lit(null).cast("string")).otherwise(title).as("title"),
      element_at(parts, 1).as("first_name"),
      when(size(parts) > 1, element_at(parts, 2))
        .otherwise(lit(null).cast("string")).as("last_name"))
  }
}
