package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Money/number cleansing as pure Column builders (SURVEY.md §2.7 C11-C19).
  * All parsers are total: null on unparseable input, never throw. */
object Money {

  /** C11 basic amount parse (pdf_ocr_inv_to_json.py:133-138,
    * read_po_csv_to_json.py:300-310): strip everything but `[0-9.\-]`,
    * null on empty/`-`/`.`/`-.`. */
  def parseAmount(c: Column): Column = {
    val cleaned = regexp_replace(c.cast("string"), "[^0-9.\\-]", "")
    // try_cast, not cast: regex survivors like "1.2.3" or ".." pass the
    // isin guard but are malformed — the contract is null, under ANSI too
    when(cleaned.isin("", "-", ".", "-.", "--"), lit(null).cast("double"))
      .otherwise(cleaned.try_cast("double"))
  }

  /** C12 robust parse (pdf_ocr_rm_to_json.py:31-64,
    * script_read_dbd_balance.py:55-80): unicode minus `−–—` → `-`,
    * parenthesized negatives `(5,463.04)` → -5463.04, digit-spaces collapsed,
    * commas dropped. */
  def parseAmountRobust(c: Column): Column = {
    val s0 = translate(trim(c.cast("string")), "−–—", "---")
    val s1 = regexp_replace(s0, "(?<=\\d)[\\s ]+(?=\\d)", "")
    val isParen = s1.rlike("^\\(.*\\)$")
    val body = regexp_replace(regexp_replace(s1, "^\\((.*)\\)$", "$1"), ",", "")
    val num = regexp_replace(body, "[^0-9.\\-]", "")
    val v = when(num.isin("", "-", ".", "-."), lit(null).cast("double"))
      .otherwise(num.try_cast("double")) // ANSI-total: "--"/"1.2.3" -> null
    when(isParen, -abs(v)).otherwise(v)
  }

  /** C13 multi-separator heuristic (pdf_ocr_sale_supplier_to_json.py:129-191):
    * both `.` and `,` present → `,` is thousands; ≥2 dots → last dot is the
    * decimal point; ≥2 commas → last comma is the decimal point; a single
    * comma and no dot → comma is the decimal point. Branchy string surgery
    * kept as a when-cascade of regexps so it stays codegen-friendly. */
  def parseAmountMultiSep(c: Column): Column = {
    val s = regexp_replace(trim(c.cast("string")), "[^0-9.,\\-]", "")
    val nDots = length(s) - length(regexp_replace(s, "\\.", ""))
    val nComm = length(s) - length(regexp_replace(s, ",", ""))
    // helper: drop every occurrence of `ch`, except treat the LAST one as '.'
    def lastAsDecimal(col: Column, ch: String): Column = {
      val esc = if (ch == ".") "\\." else ch
      val intPart  = regexp_replace(regexp_extract(col, s"^(.*)$esc([^$esc]*)$$", 1), s"[.,]", "")
      val fracPart = regexp_extract(col, s"^(.*)$esc([^$esc]*)$$", 2)
      concat(intPart, lit("."), fracPart)
    }
    val parsed =
      when(nDots > 0 && nComm > 0,
        // both present: the one occurring LAST is the decimal separator
        when(instr(reverse(s), ".") < instr(reverse(s), ","),
          regexp_replace(s, ",", ""))                    // 1,234.56
          .otherwise(lastAsDecimal(s, ",")))             // 1.234,56
        .when(nDots >= 2, lastAsDecimal(s, "\\."))       // 1.234.56 → 1234.56
        .when(nComm >= 2, lastAsDecimal(s, ","))         // 1,234,56 → 1234.56
        .when(nComm === 1, regexp_replace(s, ",", "."))  // 12,5 → 12.5
        .otherwise(s)
    when(parsed.isin("", "-", ".", "-."), lit(null).cast("double"))
      .otherwise(parsed.try_cast("double")) // ANSI-total
  }

  /** C14 dash/zero coercion — income/ratios policy (unparseable → null):
    * script_read_dbd_income.py:78-104. */
  def dashToZeroNullable(c: Column): Column = {
    val t = trim(c.cast("string"))
    when(t.isin("-", "–", "—", "0", "0.0", "±0"), lit(0.0))
      .otherwise(parseAmountRobust(c))
  }

  /** C14 balance-sheet policy (unparseable → 0.0):
    * script_read_dbd_balance.py:76-80. */
  def dashToZeroTotal(c: Column): Column =
    coalesce(dashToZeroNullable(c), lit(0.0))

  /** C15 percent keep-value: `'12.3%' → 12.3` (NOT /100),
    * script_read_dbd_ratios.py:51-74. */
  def percentValue(c: Column): Column =
    parseAmountRobust(regexp_replace(c.cast("string"), "%", ""))

  /** C16 to_numeric coerce with 0-fill (services/bs_processor.py:99-110). */
  def coerceNumericZeroFill(c: Column): Column =
    // try_cast: under ANSI a plain cast throws BEFORE coalesce can step in
    coalesce(c.try_cast("double"), parseAmountRobust(c), lit(0.0))

  /** C17 range split `"a - b"` → struct(start, end)
    * (BolApiController.php:471-480). */
  def rangeSplit(c: Column): Column = {
    val parts = split(trim(c.cast("string")), "\\s*-\\s*", 2)
    // try_element_at: a dash-less input has one part, and the missing end
    // must be null under ANSI mode too (adopter default), not an error
    struct(
      try_element_at(parts, lit(1)).try_cast("double").as("start"),
      try_element_at(parts, lit(2)).try_cast("double").as("end"))
  }

  /** C18 derived amount: excl = incl - vat when excl is 0
    * (ImportOldPO.php:151-153). */
  def deriveExclVat(excl: Column, incl: Column, vat: Column): Column =
    when(excl === 0 || excl.isNull, incl - vat).otherwise(excl)

  /** C19 money rounding: 2dp for money, 3dp for quantities
    * (pdf_ocr_sale_supplier_to_json.py:319-332). */
  def money2(c: Column): Column = round(c, 2)
  def qty3(c: Column): Column   = round(c, 3)
}
