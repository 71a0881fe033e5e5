package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OCR artifact repair (SURVEY.md §2.7 C23-C29). All pure Column chains. */
object OcrRepair {

  /** C23 look-alike repair, tail-only: after a letter prefix, `l L i I → 1`,
    * `o O → 0`; prefix upper-cased and preserved
    * (pdf_ocr_inv_to_json.py:196-220). */
  def repairTailLookalikes(c: Column): Column = {
    val s = trim(c.cast("string"))
    val prefix = regexp_extract(s, "^([A-Za-z]+)", 1)
    val tail   = regexp_extract(s, "^[A-Za-z]+(.*)$", 1)
    when(prefix =!= "",
      concat(upper(prefix), translate(tail, "lLiIoO", "111100")))
      .otherwise(s)
  }

  /** C24 global look-alike repair: `O→0`, `I→1` (L kept)
    * (pdf_ocr_rm_to_json.py:118-124). */
  def repairGlobalLookalikes(c: Column): Column =
    translate(upper(trim(c.cast("string"))), "OI", "01")

  /** C25 branch-code normalizer (pdf_ocr_rm_to_json.py:126-161):
    * `0000` anywhere → "0000"; FC+1 digit → FC0#, FC+2 → FC##
    * (space/noise tolerant); W+3 digits → W###; else cleaned upper. */
  def normalizeBranchCode(c: Column): Column = {
    val s = upper(regexp_replace(trim(c.cast("string")), "\\s+", ""))
    val fc1 = regexp_extract(s, "^FC\\D*(\\d)$", 1)
    val fc2 = regexp_extract(s, "^FC\\D*(\\d{2})$", 1)
    val w3  = regexp_extract(s, "^W\\D*(\\d{3})$", 1)
    // the "0000 anywhere" collapse tests the CLEANED string: stripping
    // punctuation can create the 0000 run, and checking pre-cleanup would
    // make the normalizer non-idempotent (PropertySpec caught this)
    val cleaned = regexp_replace(s, "[^A-Z0-9]", "")
    when(cleaned.contains("0000"), lit("0000"))
      .when(fc2 =!= "", concat(lit("FC"), fc2))
      .when(fc1 =!= "", concat(lit("FC0"), fc1))
      .when(w3 =!= "", concat(lit("W"), w3))
      .otherwise(cleaned)
  }

  /** C26 doc-ref normalizer + CONSIGN rule (pdf_ocr_rm_to_json.py:164-197):
    * `C0NS1GN(-00)` variants → `CONSIGN(-00)`; leading `1V` → `IV`;
    * else global look-alike repair. */
  def normalizeDocRef(c: Column): Column = {
    val s = upper(regexp_replace(trim(c.cast("string")), "\\s+", ""))
    // global repair first (O→0, I→1), then restore the known IV prefix —
    // a true "IV..." survives the round-trip, an OCR "1V..." is healed
    val repaired = repairGlobalLookalikes(s)
    when(s.rlike("^C[O0]NS[I1]GN-?[O0]{2}$"), lit("CONSIGN-00"))
      .when(s.rlike("^C[O0]NS[I1]GN$"), lit("CONSIGN"))
      .otherwise(regexp_replace(repaired, "^1V", "IV"))
  }

  /** C27 best-token extraction (pdf_ocr_rm_to_json.py:200-217): among regex
    * candidates, pick the longest, de-space, normalize. Implemented with
    * `regexp_extract_all` + array ordering — no UDF. */
  def bestToken(c: Column): Column = {
    val cands = regexp_extract_all(c.cast("string"),
      lit("([A-Za-z0-9]{2,}-?[A-Za-z0-9]{2,})"), lit(1))
    // longest candidate: sort (length, value) desc via a struct array
    val ranked = sort_array(
      transform(cands, t => struct(length(t).as("len"), t.as("tok"))),
      asc = false)
    when(size(cands) > 0,
      repairGlobalLookalikes(element_at(ranked, 1).getField("tok")))
      .otherwise(lit(null).cast("string"))
  }

  /** Longest common prefix of two string columns — expression-only (no UDF):
    * compare char-by-char up to 32 chars via an aggregate over a zipped
    * array. Used by C28. */
  def commonPrefixLen(a: Column, b: Column): Column = {
    val n = least(length(a), length(b))
    // find first mismatch index with filter over positions
    val idx = sequence(lit(1), greatest(n, lit(1)))
    val mismatches = filter(idx, i => a.substr(i, lit(1)) =!= b.substr(i, lit(1)))
    when(n <= 0, lit(0))
      // try_element_at: equal-up-to-n strings leave `mismatches` EMPTY and
      // the null must reach the coalesce under ANSI mode too
      .otherwise(coalesce(try_element_at(mismatches, lit(1)) - 1, n))
  }

  /** C28 ref repair via common prefix (pdf_ocr_rm_to_json.py:219-229):
    * if commonprefix(doc, ref) >= 6 or doc startsWith ref → use doc. */
  def repairRefByPrefix(doc: Column, ref: Column): Column =
    when(doc.isNotNull && ref.isNotNull &&
        (commonPrefixLen(doc, ref) >= 6 || doc.startsWith(ref)), doc)
      .otherwise(ref)

  /** C29 crossdock canonical pair (pdf_ocr_rm_to_json.py:232-254):
    * `(CROSS,DOCK)/(CROSSDOCK)/…` → struct("CROSS DOCK", "Crossdock"). */
  def canonicalizeCrossdock(c: Column): Column = {
    val s = upper(regexp_replace(trim(c.cast("string")), "[^A-Za-z]", ""))
    when(s === "CROSSDOCK",
      struct(lit("CROSS DOCK").as("code"), lit("Crossdock").as("label")))
      .otherwise(struct(trim(c.cast("string")).as("code"),
        trim(c.cast("string")).as("label")))
  }
}
